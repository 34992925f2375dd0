package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grid-density clustering (DBSCAN-lite): points land in fixed-width
  * cells (exact integer floor division over micro-unit coordinates),
  * cells with >= minPts points are CORE, and 8-adjacent core cells
  * merge into clusters via connected components (min cell label =
  * cluster id, engine-exact).
  *
  * Density clustering with ZERO pairwise distance computations: the
  * only data-sized pass is one cell-keyed count; the adjacency join,
  * CC, and reporting all run on the core-cell dictionary (bounded by
  * the occupied area / cell width², not the row count). At 100 TB the
  * same shape holds — the cell histogram is a map-side-combinable agg
  * and everything downstream is metadata-sized.
  */
object GridDensity {

  /** Floor division handling negatives identically to DuckDB's `//`. */
  private def floorDiv(x: String, c: Long): String =
    s"CASE WHEN $x >= 0 THEN ($x) div $c ELSE -(((-($x)) + ${c - 1}) div $c) END"

  /** (cluster_id, n_cells, n_points) per density cluster, from
    * micro-int coordinate columns `x6`/`y6` of `pts`.
    *
    * Cell-id encoding `(cx+64)*16384 + (cy+64)` is injective ONLY for
    * cell coordinates in [-64, 16320) on both axes — outside that range
    * distinct cells would alias to one id and silently merge clusters.
    * The bound is asserted on the (metadata-sized) core-cell dictionary
    * and the call fails loudly rather than corrupting labels; callers
    * with a wider coordinate domain must shrink it by raising
    * `cellMicro` (the cluster ids are part of the operator's contract,
    * so the encoding itself is pinned).
    */
  def clusters(pts: DataFrame, cellMicro: Long, minPts: Long): DataFrame = {
    val s = pts.sparkSession
    val cells = pts
      .select(expr(floorDiv("x6", cellMicro)).as("cx"),
        expr(floorDiv("y6", cellMicro)).as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("npts"))
      .filter(col("npts") >= minPts)
      .withColumn("cell", (col("cx") + 64) * 16384 + (col("cy") + 64))
      .localCheckpoint(true) // cell dictionary: edges + assignment
    val outOfDomain = cells.filter(
      col("cx") < -64 || col("cx") >= 16320 ||
        col("cy") < -64 || col("cy") >= 16320).limit(1).count()
    require(outOfDomain == 0L,
      s"GridDensity cell coordinates exceed the injective id domain " +
        s"[-64, 16320); raise cellMicro (currently $cellMicro)")
    // Adjacency joins on the TRUE (cx, cy) pair, never on an encoded
    // neighbor id: encoding cx+dx/cy+dy first would wrap across the
    // y-axis at the domain edges (cy=-64 with dy=-1 aliases the id of
    // (cx+dx-1, 16319)) and silently merge spatially distant clusters —
    // the in-domain require guards actual cells, not neighbor probes.
    val nbr = cells.select(col("cell"), col("cx"), col("cy"))
      .crossJoin(broadcast(s.createDataFrame(
        Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)))
        .toDF("dx", "dy")))
      .withColumn("ncx", col("cx") + col("dx"))
      .withColumn("ncy", col("cy") + col("dy"))
      .join(cells.select(col("cell").as("ncell"), col("cx").as("ncx"),
        col("cy").as("ncy")), Seq("ncx", "ncy"))
      .filter(col("cell") < col("ncell"))
      .select(col("cell").as("ca"), col("ncell").as("cb"))
    // Star contraction converges in O(log n) rounds on ANY cell-graph
    // shape (min-label propagation caps at maxIter and would silently
    // return unconverged labels on a core-cell chain deeper than its
    // round budget, diverging from the fully-converged oracle CTE).
    val comp = Dedup.connectedComponentsStar(nbr, "ca", "cb")
    cells
      .join(comp.withColumnRenamed("node", "cell"), Seq("cell"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("cell")))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_cells"), sum("npts").as("n_points"))
  }
}
