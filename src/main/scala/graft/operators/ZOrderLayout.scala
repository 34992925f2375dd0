package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order vs linear layout scoring (the OPTIMIZE ZORDER decision:
  * which key layout gives min/max file skipping the smallest per-slab
  * bounding boxes), with a SCALE-DISPATCHED entry point — the q318/q344
  * pair behind one door, the `autoTopK` pattern (round-10 verdict
  * item 7).
  *
  *  - [[scoreExact]] — slab boundaries from ONE exact `percentile` agg
  *    (63-point grid per layout, both grids in the same pass). Exact
  *    per-group value buffering: the ORACLE-TRUTH form, priced for
  *    dictionary/harness scale (declared as q318).
  *  - [[scoreSketch]] — boundaries from ONE mergeable
  *    `approx_percentile` agg (t-digest, single pass, no value
  *    collection): the form that survives 100 TB, with the slab-
  *    population contract computed alongside (declared as q344).
  *  - [[score]] — dispatches by row count: exact at or below
  *    `spark.graft.layout.exactLimit` (default 10M — the measured
  *    single-box comfort ceiling for exact percentile value
  *    buffering), sketch above. A user reaching for "score my layout"
  *    gets the plan that survives their corpus without reading any
  *    scaladoc.
  *
  * Slab assignment is always the EquiDepthBins literal binary-search
  * CASE tree (6 codegen'd compares per row); both folds and the
  * boundary agg read one localCheckpointed keyed frame.
  *
  * Reference: the layout decision a 100 TB deployment replays before
  * `repartitionByRange` writes; q318's scaladoc carries the full
  * provenance.
  */
object ZOrderLayout {
  /** Morton interleave of two 10-bit ints as a pure integer expression
    * string (bit i of a → bit 2i, bit i of b → bit 2i+1), expanded at
    * plan time — codegen-able arithmetic, no UDF.
    */
  def morton10(a: String, b: String): String =
    (0 until 10).map(i =>
      s"(((($a) >> $i) & 1) << ${2 * i}) + (((($b) >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  private val qs63 = (1 to 63).map(i => i / 64.0).mkString(", ")

  /** (a, b, z, k) keyed frame from two integer key expressions mod 1024,
    * localCheckpointed — the boundary agg and both layout folds read it.
    */
  def keyed(df: DataFrame, aExpr: String, bExpr: String): DataFrame =
    df.select(expr(s"($aExpr) % 1024").as("a"), expr(s"($bExpr) % 1024").as("b"))
      .withColumn("z", expr(morton10("a", "b")))
      .withColumn("k", col("a") * 1024 + col("b"))
      .localCheckpoint()

  private def areaFold(
      keyed: DataFrame, keyCol: String, caseExpr: String): DataFrame =
    keyed
      .select(col("a"), col("b"), expr(caseExpr).as("slab"))
      .groupBy("slab")
      .agg(((max("a") - min("a") + 1) * (max("b") - min("b") + 1)).as("area"),
        count(lit(1)).as("pop"))

  private def withVerdict(zRaw: DataFrame, linRaw: DataFrame): DataFrame = {
    // pin each layout's one-row area summary: the union row and the
    // verdict probe would otherwise each re-run the slab-keyed pass
    // over the full keyed frame (4 data passes instead of 2)
    val z = zRaw.localCheckpoint()
    val lin = linRaw.localCheckpoint()
    z.unionByName(lin)
      .crossJoin(broadcast(
        z.select(col("sum_area").as("za"))
          .crossJoin(lin.select(col("sum_area").as("la")))
          .select((col("za") < col("la")).as("zorder_wins"))))
  }

  /** Exact-boundary scoring → (layout, sum_area, zorder_wins), unsorted.
    * BOTH layouts' exact 63-point boundary grids come from ONE
    * percentile aggregation pass (collected — 2×63 values, bounded) and
    * embed as literal binary-search CASE trees.
    */
  def scoreExact(keyed: DataFrame): DataFrame = {
    val bothBs = keyed.agg(
      expr(s"transform(percentile(z, array($qs63)), q -> round(q, 6))").as("zbs"),
      expr(s"transform(percentile(k, array($qs63)), q -> round(q, 6))").as("kbs"))
      .head()
    def layoutArea(keyCol: String, bs: Seq[Double], name: String): DataFrame = {
      val caseExpr = EquiDepthBins.searchCountExpr(
        keyCol, bs.map(b => s"${b}D"), strict = true)
      areaFold(keyed, keyCol, caseExpr)
        .agg(sum("area").as("sum_area"))
        .select(lit(name).as("layout"), col("sum_area"))
    }
    withVerdict(
      layoutArea("z", bothBs.getSeq[Double](0), "zorder"),
      layoutArea("k", bothBs.getSeq[Double](1), "linear"))
  }

  /** Sketch-boundary scoring → (layout, n_rows, slabs_ok, sum_area,
    * zorder_wins), unsorted. ONE mergeable approx_percentile agg fits
    * both layouts' boundaries (integer input ⇒ actual data values as
    * longs); each layout pays one slab-keyed pass computing bounding
    * boxes AND the slab-population contract together (population within
    * n/64 ± (n/500 + 8) for ALL 64 slabs — the count(*)=64 conjunct
    * catches empty slabs from degenerate duplicate boundaries).
    */
  def scoreSketch(keyed: DataFrame): DataFrame = {
    val row = keyed.agg(
      expr(s"approx_percentile(z, array($qs63), 10000)").as("zb"),
      expr(s"approx_percentile(k, array($qs63), 10000)").as("kb"),
      count(lit(1)).as("n")).head()
    val n = row.getLong(2)
    val slack = n / 500 + 8
    def layout(keyCol: String, bs: Seq[Long], name: String): DataFrame = {
      val caseExpr = EquiDepthBins.searchCountExpr(
        keyCol, bs.map(b => s"${b}L"), strict = true)
      areaFold(keyed, keyCol, caseExpr)
        .agg(sum("area").as("sum_area"),
          (min(col("pop") >= lit(n / 64 - slack) &&
            col("pop") <= lit(n / 64 + slack)) &&
            count(lit(1)) === 64).as("slabs_ok"))
        .select(lit(name).as("layout"), lit(n).as("n_rows"),
          col("slabs_ok"), col("sum_area"))
    }
    withVerdict(
      layout("z", row.getSeq[Long](0), "zorder"),
      layout("k", row.getSeq[Long](1), "linear"))
      .select("layout", "n_rows", "slabs_ok", "sum_area", "zorder_wins")
  }

  /** Scale-dispatched scoring → (layout, sum_area, zorder_wins, mode)
    * ordered by layout. Row count at or below
    * `spark.graft.layout.exactLimit` (default 10M) takes the exact
    * oracle-truth path; above it, the mergeable-sketch path.
    */
  def score(keyed: DataFrame, exactLimit: Long = -1L): DataFrame = {
    val limit =
      if (exactLimit >= 0) exactLimit
      else keyed.sparkSession.conf
        .get("spark.graft.layout.exactLimit", "10000000").toLong
    val out =
      if (keyed.count() <= limit) scoreExact(keyed).withColumn("mode", lit("exact"))
      else scoreSketch(keyed)
        .select(col("layout"), col("sum_area"), col("zorder_wins"))
        .withColumn("mode", lit("sketch"))
    out.orderBy("layout")
  }
}
