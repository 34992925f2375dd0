package graft.wafer

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic synthetic wafer dataset per FIXTURES.md §A (seed=42):
  * exercises every reference semantic — planted upper outliers per
  * Class, a Class with IQR==0, a Class with <2 non-null in a size
  * column, null Class rows, zero/denominator edge values, feature
  * nulls, two well-separated blobs per analysed step, REAL rows of an
  * unanalysed step, FALSE rows.
  */
object WaferFixture {
  val blobOffset = 50.0 // separation between the two per-step blobs

  def df(spark: SparkSession): DataFrame = {
    val rnd = new Random(42)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    var id = 0
    def mk(
        cls: String, isDefect: String, step: String,
        sizeX: java.lang.Double, sizeY: java.lang.Double, area: java.lang.Double,
        blob: Int = 0, featNull: Boolean = false): Row = {
      id += 1
      val base = if (blob == 0) 0.0 else blobOffset * blob
      val feats: Seq[java.lang.Double] = (0 until 15).map { i =>
        if (featNull && i == 3) null
        else java.lang.Double.valueOf(base + rnd.nextGaussian())
      }
      Row.fromSeq(
        Seq(s"LOT$id", s"W$id",
          java.lang.Double.valueOf(rnd.nextDouble()), java.lang.Double.valueOf(rnd.nextDouble()),
          cls, isDefect, step, sizeX, sizeY, area) ++ feats)
    }
    def d(v: Double): java.lang.Double = java.lang.Double.valueOf(v)

    // Class A: 40 normal rows + 4 planted upper outliers in SIZE_X
    for (_ <- 1 to 40)
      rows += mk("A", "FALSE", "ETCH", d(10 + rnd.nextDouble()), d(20 + rnd.nextDouble()), d(5 + rnd.nextDouble()))
    for (_ <- 1 to 4)
      rows += mk("A", "FALSE", "ETCH", d(500 + rnd.nextDouble()), d(20 + rnd.nextDouble()), d(5 + rnd.nextDouble()))
    // Class B: IQR == 0 in SIZE_X (constant), outliers in SIZE_Y survive col1
    for (_ <- 1 to 30)
      rows += mk("B", "FALSE", "ETCH", d(7.0), d(15 + rnd.nextDouble()), d(3 + rnd.nextDouble()))
    for (_ <- 1 to 3)
      rows += mk("B", "FALSE", "ETCH", d(7.0), d(400 + rnd.nextDouble()), d(3 + rnd.nextDouble()))
    // Class C: <2 non-null SIZE_X (skip path), normal elsewhere
    rows += mk("C", "FALSE", "ETCH", d(9.0), d(18.0), d(4.0))
    for (_ <- 1 to 10)
      rows += mk("C", "FALSE", "ETCH", null, d(18 + rnd.nextDouble()), d(4 + rnd.nextDouble()))
    // null Class rows (pandas groupby drops them)
    for (_ <- 1 to 5)
      rows += mk(null, "FALSE", "ETCH", d(10.0), d(20.0), d(5.0))
    // per analysed step: two REAL blobs (8 + 8), plus a feature-null REAL row
    for (step <- WaferSchema.defaultSteps) {
      for (_ <- 1 to 8)
        rows += mk("A", "REAL", step, d(10 + rnd.nextDouble()), d(20 + rnd.nextDouble()), d(5 + rnd.nextDouble()), blob = 1)
      for (_ <- 1 to 8)
        rows += mk("A", "REAL", step, d(10 + rnd.nextDouble()), d(20 + rnd.nextDouble()), d(5 + rnd.nextDouble()), blob = -1)
      rows += mk("A", "REAL", step, d(10.0), d(20.0), d(5.0), blob = 1, featNull = true)
    }
    // REAL rows of an unanalysed step + epsilon/zero edge rows
    for (_ <- 1 to 5)
      rows += mk("A", "REAL", "OTHER", d(10.0), d(20.0), d(5.0))
    rows += mk("A", "FALSE", "ETCH", d(10.0), d(0.0), d(0.0))      // SIZE_Y=0, DEFECT_AREA=0
    rows += mk("A", "FALSE", "ETCH", d(10.0), d(-1e-6), d(5.0))    // exact -eps denominator → inf path

    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), WaferSchema.inputSchema)
  }
}
