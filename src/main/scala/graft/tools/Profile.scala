package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Num.dsum

/** Dev profiler: isolates where bench time goes for a hot query.
  * Not part of the driver contract; run via
  *   runMain graft.tools.Profile [sfDir]
  */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // warm everything once
    li.agg(count(lit(1))).collect()

    time("scan count(*)")(li.agg(count(lit(1))).collect())
    time("scan 1 double col sum(double)")(
      li.agg(sum("l_quantity")).collect())
    time("scan 1 double col dsum(decimal)")(
      li.agg(dsum(col("l_quantity"))).collect())
    def q01(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("l_shipdate") <= lit("1999-06-30").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
    time("q01 single-file scan")(q01(li).collect())
    time("q01 again")(q01(li).collect())
    val li32 = li.repartition(32).cache()
    li32.count()
    time("q01 on cached 32-part input")(q01(li32).collect())
    time("q01 on cached 32-part input again")(q01(li32).collect())
    li32.unpersist()
    val doubleSums = li
      .filter(col("l_shipdate") <= lit("1999-06-30").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1)))
    time("q01-ish plain double sums")(doubleSums.collect())
    spark.stop()
  }
}
