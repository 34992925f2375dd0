package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared graph machinery for the co-purchase family (q143/q165/q223/
  * q245/q261/q307/q339 all analyze the parts-sharing-an-order graph) —
  * ONE edge-list definition plus the SCALE-DISPATCHED triangle/k-core
  * defaults (the `LinkPrediction.topK` pattern: measure the exact
  * algorithm's resource with an aggregation the query needs anyway, then
  * route exact vs a deterministic sampled estimator).
  *
  * The estimator is DOULION-shaped (Tsourakakis et al., KDD'09: count
  * triangles on an edge-sampled graph, rescale by the inverse sampling
  * probability cubed) but with DETERMINISTIC hash selection instead of
  * coin flips: an edge survives iff hash60(u ':' v) % p == 0. That keeps
  * the whole estimate a pure function of the data — reproducible across
  * runs, engines, and partitionings — which is what lets the sampled
  * branch be declared and HASH-oracled (DuckDB runs the identical
  * selection), not just contract-gated.
  *
  * Scale shape of the sampled branch: the sample pass is one codegen'd
  * per-row predicate (no shuffle); every downstream join/agg then runs on
  * m/p edges and ~mass/p² wedges — the knob that keeps the wedge-bound
  * family alive at 100 TB where exact enumeration's Σ deg² work is the
  * query. Estimator error is O(√(p³/T)) relative on T triangles — at the
  * harness graph (T ≈ 4·10⁵, p = 4) under 1%.
  */
object Graphs {

  /** Default keep-1-in-p for the sampled branches (p = 4: 16× less wedge
    * mass, <1% triangle error at harness scale; overridable via conf
    * `spark.graft.graph.sampleMod`).
    */
  val defaultSampleMod: Int = 4

  /** Doubled-edge-count ceiling for the exact k-core peel (measured:
    * 24M doubled edges peel in ~51 s single-box at 10× harness scale —
    * safe but the slowest roster entry there; 10⁷ routes that regime to
    * the sampled peel while every harness-scale correctness run stays
    * exact). Overridable via conf `spark.graft.graph.kcoreEdgeLimit`.
    */
  val defaultKcoreEdgeLimit: Long = 10000000L

  /** Oriented (u < v), distinct co-purchase edges: parts that share an
    * order. localCheckpoint'd — every caller fans out over it (degree
    * aggs, wedge joins, peel rounds), and the co-occurrence self-join +
    * distinct is the expensive stage that must never re-run.
    */
  def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val op = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
      .localCheckpoint()
  }

  /** DuckDB CTE fragment building the same edge list (`op`, `e`) — the
    * oracle-side twin of [[coPurchaseEdges]], kept next to it so the two
    * dialects cannot drift.
    */
  val coPurchaseEdgesDuck: String =
    """op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |        e AS (
      |          SELECT DISTINCT a.p AS u, b.p AS v
      |          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)""".stripMargin

  /** Both directions of an oriented edge list (the adjacency view the
    * degree/peel/BFS passes read).
    */
  def doubled(e: DataFrame): DataFrame =
    e.select("u", "v").unionAll(e.select(col("v").as("u"), col("u").as("v")))

  /** Deterministic 1-in-p edge sample: keep iff hash60(u ':' v) % p == 0.
    * Pure per-row codegen predicate — the sample never shuffles.
    */
  def sampleEdges(e: DataFrame, p: Int): DataFrame =
    e.filter(expr(samplePredSpark(p)))

  def samplePredSpark(p: Int): String =
    s"${TextOps.hash60Spark("concat(cast(u as string), ':', cast(v as string))")} % $p = 0"

  /** DuckDB mirror of [[samplePredSpark]]. */
  def samplePredDuck(p: Int): String =
    s"${TextOps.hash60Duck("CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)")} % $p = 0"

  /** Exact oriented triangle count — q143's plan: each triangle is ONE
    * (a→b, b→c, a→c) row under the u<v orientation, two equi-joins, and
    * the closing join is SHUFFLE_HASH-hinted so the wedge stream (the
    * Σ deg² mass) is hash-probed against the edge list, never sorted.
    */
  def exactTriangleCount(e: DataFrame): Long =
    e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3").hint("SHUFFLE_HASH"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .count()

  /** Wedge mass Σ deg(n)² of the doubled graph — the exact enumeration's
    * resource, measured with one keyed agg + one scalar agg.
    */
  def wedgeMass(e: DataFrame): Long = {
    val deg = doubled(e).groupBy("u").agg(count(lit(1)).as("dg"))
    Option(deg.agg(sum(col("dg") * col("dg"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
  }

  /** Triangle census (n_nodes, n_edges, n_triangles) with a
    * SCALE-DISPATCHED count: n_nodes/n_edges are always exact (linear
    * passes), and the measured wedge mass routes n_triangles:
    *
    *  - mass ≤ `spark.graft.graph.wedgeMassLimit` (default 5·10⁸, the
    *    `LinkPrediction` ceiling) → [[exactTriangleCount]];
    *  - above → DOULION on the deterministic 1-in-p sample: exact count
    *    on the sampled graph × p³ (each triangle survives with p⁻³).
    *    Semantics in this regime: an unbiased deterministic estimate
    *    (relative error ~√(p³/T)), the standard trade that keeps the
    *    wedge-bound count alive on a dense 100 TB graph.
    */
  def triangleStats(e: DataFrame, wedgeMassLimit: Long = -1L,
      sampleMod: Int = -1): DataFrame = {
    val s = e.sparkSession
    val limit =
      if (wedgeMassLimit >= 0) wedgeMassLimit
      else s.conf.get("spark.graft.graph.wedgeMassLimit",
        LinkPrediction.defaultWedgeMassLimit.toString).toLong
    val p =
      if (sampleMod > 0) sampleMod
      else s.conf.get("spark.graft.graph.sampleMod",
        defaultSampleMod.toString).toInt
    val mass = wedgeMass(e)
    val tri =
      if (mass <= limit) exactTriangleCount(e)
      else exactTriangleCount(sampleEdges(e, p).localCheckpoint()) *
        p.toLong * p * p
    val nodes = e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n"))).distinct().count()
    val edges = e.count()
    import s.implicits._
    Seq((nodes, edges, tri)).toDF("n_nodes", "n_edges", "n_triangles")
  }

  /** k-core peel census (round, n_nodes, n_edges) over `rounds` rounds
    * with a SCALE-DISPATCHED graph: the doubled-edge count (the peel's
    * per-round work) routes
    *
    *  - ≤ `spark.graft.graph.kcoreEdgeLimit` (default 10⁷) → EXACT peel
    *    of the full graph at threshold `k` (the q245 oracle-truth form);
    *  - above → peel of the deterministic 1-in-p edge sample at
    *    threshold ⌈k/p⌉, edge counts rescaled ×p. Semantics in this
    *    regime: a degree-concentration estimate (sampled degrees are
    *    Binomial(deg, 1/p), so the k-core census is approximated by the
    *    ⌈k/p⌉-core of the sample — the p× work reduction that keeps the
    *    multi-round peel alive when the full edge list outgrows a box).
    *
    * Every round localCheckpoints (the Dedup.*Star discipline): lineage
    * and Catalyst re-analysis of the growing self-join tree stay one
    * round deep.
    */
  def kcoreRounds(e: DataFrame, k: Int, rounds: Int,
      edgeLimit: Long = -1L, sampleMod: Int = -1): DataFrame =
    kcoreRoundsCounted(e, k, rounds, edgeLimit, sampleMod)._1

  /** As kcoreRounds, but also returns how many peel rounds actually
    * executed — the early-exit observability hook GraphsKcoreSpec pins
    * (the FixpointSpec discipline).
    */
  private[graft] def kcoreRoundsCounted(e: DataFrame, k: Int, rounds: Int,
      edgeLimit: Long = -1L, sampleMod: Int = -1): (DataFrame, Int) = {
    val s = e.sparkSession
    val limit =
      if (edgeLimit >= 0) edgeLimit
      else s.conf.get("spark.graft.graph.kcoreEdgeLimit",
        defaultKcoreEdgeLimit.toString).toLong
    val p =
      if (sampleMod > 0) sampleMod
      else s.conf.get("spark.graft.graph.sampleMod",
        defaultSampleMod.toString).toInt
    // the dispatch probe is one count over the (checkpointed) oriented
    // edge list the query builds anyway
    val m = 2L * e.count()
    val (g0, kk, scale) =
      if (m <= limit) (doubled(e).localCheckpoint(true), k, 1L)
      else (doubled(sampleEdges(e, p)).localCheckpoint(true),
        (k + p - 1) / p, p.toLong)
    var und = g0
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    var nodes = und.select("u").distinct().count()
    var edges = und.count()
    out += ((0, nodes, edges / 2 * scale))
    var r = 1
    var executed = 0
    while (r <= rounds && out.size == r) {
      executed += 1
      val keep = und.groupBy("u").agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= kk).select("u")
      und = und.join(keep.as("ka"), Seq("u"))
        .join(keep.as("kb").withColumnRenamed("u", "v"), Seq("v"))
        .select("u", "v")
        .localCheckpoint(true)
      val n2 = und.select("u").distinct().count()
      val e2 = und.count()
      out += ((r, n2, e2 / 2 * scale))
      // Fixpoint early-exit (the Iterate.fixpoint discipline): the peel
      // is monotone, so an unchanged edge count means no node fell
      // below the threshold and every later round is a no-op — emit the
      // remaining fixed rows without running their joins. The counts
      // are computed for the output anyway, so the probe is free;
      // output-invariant w.r.t. the fixed-round oracle unroll.
      if (e2 == edges && n2 == nodes)
        for (rr <- r + 1 to rounds) out += ((rr, n2, e2 / 2 * scale))
      nodes = n2
      edges = e2
      r += 1
    }
    import s.implicits._
    (out.toSeq.toDF("round", "n_nodes", "n_edges"), executed)
  }
}
