package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Source/sink format breadth: parquet, CSV, JSON, and ORC round-trips with
  * schema preservation (timestamps normalized — CSV/JSON carry less
  * type fidelity than parquet and must be read back with an explicit
  * schema, which is the engine's declared-schema policy anyway).
  */
class FormatRoundTripSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("orders survive parquet, csv, json, and orc round-trips") {
    val orders = Tables(spark, dir, "orders")
    val n = orders.count()
    val checksum = orders.agg(
      sum(col("o_orderkey")).as("keys"),
      sum(col("o_totalprice").cast("decimal(28,6)")).cast("double").as("total")).head

    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    orders.write.mode("overwrite").parquet(s"$base/p")
    orders.write.mode("overwrite").option("header", "true").csv(s"$base/c")
    orders.write.mode("overwrite").json(s"$base/j")
    orders.write.mode("overwrite").orc(s"$base/o")

    val fromParquet = spark.read.parquet(s"$base/p")
    val fromCsv = spark.read.option("header", "true").schema(orders.schema).csv(s"$base/c")
    val fromJson = spark.read.schema(orders.schema).json(s"$base/j")
    val fromOrc = spark.read.orc(s"$base/o")

    for ((name, df) <- Seq("parquet" -> fromParquet, "csv" -> fromCsv, "json" -> fromJson,
      "orc" -> fromOrc)) {
      assert(df.count() === n, name)
      val cs = df.agg(
        sum(col("o_orderkey")).as("keys"),
        sum(col("o_totalprice").cast("decimal(28,6)")).cast("double").as("total")).head
      assert(cs === checksum, name)
      assert(df.schema.fieldNames.sorted.toSeq === orders.schema.fieldNames.sorted.toSeq, name)
    }
  }
}
