package graft.wafer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed synthetic wafer-dataset generator (dataset.csv-shaped,
  * FIXTURES.md §A): deterministic given (seed, partition count), built
  * from spark.range + column expressions so it generates in parallel on
  * executors — no driver-side row materialization, usable at any scale.
  *
  * Used by Bench to time the full pipeline at the reference's canonical
  * 63,909-row scale (BASELINE.md) and beyond.
  */
object WaferDataGen {
  def generate(spark: SparkSession, n: Long, seed: Long = 42L, parts: Int = 32): DataFrame = {
    val classes = array(lit("A"), lit("B"), lit("C"), lit("D"), lit("E"))
    val steps = array(lit("PC"), lit("RMG"), lit("CBCMP"), lit("ETCH"), lit("OTHER"))
    val base = spark.range(0, n, 1, parts)
      .withColumn("__cls", element_at(classes, (col("id") % 5 + 1).cast("int")))
      .withColumn("__step", element_at(steps, (col("id") % 5 + 1).cast("int")))
      .withColumn("__real", rand(seed) < 0.3)
      .withColumn("__blob", when(col("id") % 2 === 0, 1.0).otherwise(-1.0))
      .withColumn("__out", rand(seed + 1) < 0.02) // planted upper outliers
    val classShift = (col("id") % 5).cast("double") * 3.0
    def sizeCol(s: Long) =
      when(col("__out"), lit(400.0) + rand(seed + s) * 100)
        .otherwise(lit(10.0) + classShift + randn(seed + s).cast("double"))
    def featCol(s: Long) =
      when(col("__real"), col("__blob") * 50.0).otherwise(0.0) + randn(seed + s).cast("double")
    val features = WaferSchema.clusterFeatures.drop(3).zipWithIndex.map {
      case (f, i) => featCol(100 + i).as(f)
    }
    base.select(
      (Seq(
        concat(lit("LOT"), col("id")).as("LOT_ID"),
        concat(lit("W"), col("id") % 25).as("WAFER_ID"),
        (rand(seed + 10) * 300.0).as("COORD_X"),
        (rand(seed + 11) * 300.0).as("COORD_Y"),
        col("__cls").as("Class"),
        when(col("__real"), lit("REAL")).otherwise(lit("FALSE")).as("IS_DEFECT"),
        col("__step").as("Step_desc"),
        sizeCol(20).as("SIZE_X"),
        sizeCol(21).as("SIZE_Y"),
        sizeCol(22).as("DEFECT_AREA")) ++ features): _*)
  }
}
