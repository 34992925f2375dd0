package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.Similarity

/** Forty-second wave — the DECLARED approx-percentile production twins
  * (round-7 verdict item 2): q146 (KS drift) and q290 (daily quantile
  * bands) evaluate exact `percentile` grids, which need a global
  * per-group value collection — the named scale-killer at 100 TB. The
  * conf-gated t-digest rewrite (`plans/GraftExtensions`) existed but the
  * declared plan a user copies was still the exact one. These twins make
  * the approx path itself a declared, oracled query under the q134
  * rank-error contract: the sketch boundary's TRUE rank must straddle
  * its target within n/1000 + 4 (accuracy 10000 ⇒ 10× headroom), an
  * all-integer predicate that holds under ANY sketch merge order — so
  * the gate is deterministic even though `approx_percentile` partial-
  * merge order is not. Output columns are exact counts + pinned-TRUE
  * gates (the q32/q133/q134 sketch-contract oracle discipline).
  *
  *  - q294: KS drift on a 99-point approx-percentile grid — zero
  *    sorts, two data scans (mergeable sketch agg + bucket fold); the
  *    cumulative windows run over the ≤400-row bucket table.
  *  - q295: daily p10/p50/p90 bands from one per-day sketch agg + one
  *    rank-count fold; the day dictionary is broadcast-sized.
  *
  * Reference anchor: defect-density distribution monitoring over
  * `/root/reference/src/eda.py`-style summaries, re-expressed as
  * sketch-gated streaming-friendly aggregations.
  */
object Training42 {
  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- q146's production twin: two-sample KS drift statistic on an
    // approx_percentile grid. The exact q146 stays the oracle-truth
    // baseline; THIS is the plan that survives 100 TB: the grid comes
    // from one mergeable sketch aggregation (no global sort, no
    // per-group value collection), the data is scanned exactly twice,
    // and every window/join below the fold runs on the bucket table
    // (≤ 400 rows regardless of data size). Gates:
    //   grid_ok — every boundary b_i's true-rank interval [lt_i, le_i]
    //     straddles i·n/100 within slack n/1000 + 4 (the q134 rank
    //     contract at 10× headroom; robust to sketch merge order).
    //   d_valid — the grid KS statistic lands in [0, 1e6] ppm (the
    //     statistic itself is sketch-dependent, so the oracle pins its
    //     RANGE, not its value; q146 pins the exact-grid value).
    QueryDef(
      "q294_ks_drift_tdigest",
      (s, d) => {
        // 99 grid points (round 9: halved from 199 — the KS validity
        // argument is unchanged, the grid statistic is a monotone lower
        // bound of true D at ANY grid resolution, and the per-row cost
        // is the two literal CASE chains, linear in grid size; measured
        // the dominant 10x term)
        val qs = (1 to 99).map(i => i / 100.0).mkString(", ")
        val v = t(s, d, "lineitem")
          .filter(col("l_returnflag").isin("R", "A"))
          .select(col("l_returnflag").as("f"), col("l_extendedprice").as("x"))
        // sketch boundaries collected (99 doubles — bounded) and
        // embedded as codegen'd BINARY-SEARCH CASE trees (round 9:
        // ⌈log₂ 99⌉ = 7 compares per row instead of the linear chain's
        // ~50 — EquiDepthBins.searchCountExpr); per row both rank
        // views from a single scan: bucket_gt = #boundaries strictly
        // below x, bucket_ge = #boundaries at-or-below x.
        val bs = v.agg(
          expr(s"approx_percentile(x, array($qs), 10000)").as("bs"))
          .head().getSeq[Double](0)
        val lits = bs.map(b => s"${b}D")
        val c = v
          .select(col("f"),
            expr(graft.operators.EquiDepthBins
              .searchCountExpr("x", lits, strict = true)).as("bucket_gt"),
            expr(graft.operators.EquiDepthBins
              .searchCountExpr("x", lits, strict = false)).as("bucket_ge"))
          .groupBy("bucket_gt", "bucket_ge")
          .agg(
            sum(when(col("f") === "R", 1L).otherwise(0L)).as("cr"),
            sum(when(col("f") === "A", 1L).otherwise(0L)).as("ca"))
          .localCheckpoint(true) // bucket table: everything below is metadata-sized
        val totals = c.agg(
          sum("cr").as("nr"), sum("ca").as("na"),
          (sum("cr") + sum("ca")).as("n"))
        // KS D on the grid, exactly the q146 integer arithmetic.
        val w = Window.orderBy("bucket_gt").rowsBetween(Window.unboundedPreceding, 0)
        val dec = "CAST(%s AS DECIMAL(38,0))"
        val dppm = c.groupBy("bucket_gt")
          .agg(sum("cr").as("cr"), sum("ca").as("ca"))
          .withColumn("cum_r", sum("cr").over(w))
          .withColumn("cum_a", sum("ca").over(w))
          .crossJoin(broadcast(totals))
          .agg(max(abs(
            expr(dec.format("cum_r")) * expr(dec.format("na")) -
              expr(dec.format("cum_a")) * expr(dec.format("nr")))).as("__m"),
            max(col("nr")).as("nr2"), max(col("na")).as("na2"))
          .select(expr(s"""CAST((2 * 1000000 * __m + ${dec.format("nr2")} * na2)
                   div (2 * ${dec.format("nr2")} * na2) AS BIGINT)""").as("d_ppm"))
        // rank gate: lt_i / le_i read off the bucket histograms; the
        // 99-row grid × ≤200-row bucket table product is metadata work.
        val grid = s.range(1, 100).toDF("i")
        val gate = grid.crossJoin(broadcast(c)).crossJoin(broadcast(totals))
          .groupBy("i")
          .agg(
            sum(when(col("bucket_ge") <= col("i") - 1, col("cr") + col("ca"))
              .otherwise(0L)).as("lt_i"),
            sum(when(col("bucket_gt") <= col("i") - 1, col("cr") + col("ca"))
              .otherwise(0L)).as("le_i"),
            max(col("n")).as("n"))
          .withColumn("slack", col("n") / lit(1000L) + 4L)
          .select((col("lt_i") * 100 <= col("i") * col("n") + col("slack") * 100 &&
            col("le_i") * 100 >= col("i") * col("n") - col("slack") * 100).as("ok"))
          .agg(min(col("ok")).as("grid_ok"))
        broadcast(totals).crossJoin(broadcast(gate)).crossJoin(broadcast(dppm))
          .select(
            col("nr").as("n_r"), col("na").as("n_a"), col("grid_ok"),
            (col("d_ppm") >= 0L && col("d_ppm") <= 1000000L).as("d_valid"))
      },
      Some("""
        SELECT CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
               CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               TRUE AS grid_ok, TRUE AS d_valid
        FROM lineitem WHERE l_returnflag IN ('R', 'A')""")),

    // ---- q290's production twin: daily p10/p50/p90 bands from ONE
    // per-day approx_percentile agg (mergeable sketch — no per-day
    // value collection) plus ONE rank-count fold; each band value is
    // gated by its true-rank straddle (p·n ± (n/1000 + 4)). The day
    // dictionary is broadcast-sized at any corpus scale.
    QueryDef(
      "q295_quantile_bands_tdigest",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(to_date(col("ts")).as("day"), col("value"))
        val b = ev.groupBy("day")
          .agg(count(lit(1)).as("n"),
            expr("approx_percentile(value, array(0.1d, 0.5d, 0.9d), 10000)").as("ap"))
        ev.join(broadcast(b), Seq("day"))
          .groupBy("day")
          .agg(
            max(col("n")).as("n"),
            sum(when(col("value") < expr("ap[0]"), 1L).otherwise(0L)).as("lt10"),
            sum(when(col("value") <= expr("ap[0]"), 1L).otherwise(0L)).as("le10"),
            sum(when(col("value") < expr("ap[1]"), 1L).otherwise(0L)).as("lt50"),
            sum(when(col("value") <= expr("ap[1]"), 1L).otherwise(0L)).as("le50"),
            sum(when(col("value") < expr("ap[2]"), 1L).otherwise(0L)).as("lt90"),
            sum(when(col("value") <= expr("ap[2]"), 1L).otherwise(0L)).as("le90"))
          .withColumn("slack", col("n") / lit(1000L) + 4L)
          .select(col("day"), col("n"),
            (col("lt10") * 10 <= col("n") + col("slack") * 10 &&
              col("le10") * 10 >= col("n") - col("slack") * 10).as("band10_ok"),
            (col("lt50") * 2 <= col("n") + col("slack") * 2 &&
              col("le50") * 2 >= col("n") - col("slack") * 2).as("band50_ok"),
            (col("lt90") * 10 <= col("n") * 9 + col("slack") * 10 &&
              col("le90") * 10 >= col("n") * 9 - col("slack") * 10).as("band90_ok"))
          .orderBy("day")
      },
      Some("""
        SELECT CAST(ts AS DATE) AS day, count(*) AS n,
               TRUE AS band10_ok, TRUE AS band50_ok, TRUE AS band90_ok
        FROM events GROUP BY 1 ORDER BY day""")),

    // ---- persist-and-probe ANN (round-7 verdict item 5): the IVF
    // index is BUILT ONCE as a versioned snapshot artifact
    // (Similarity.buildIvfIndex → Sinks commit protocol: lists/v0 +
    // centroids/v0 with _SUCCESS markers) and the declared query
    // PROBES THE STORED INDEX — quantizer fit happens zero times at
    // query time, the build-once/probe-many shape a real 100 TB
    // deployment has (ivfTopK, which refits per query, stays the
    // in-query oracle form). Probed at nprobe = nlist: every stored
    // list is scanned, so the entire storage round-trip (write, commit
    // protocol, version resolution, centroid routing, list join,
    // re-rank) must reproduce brute-force top-k exactly — the q63/q229
    // identity — and the oracle is q49's brute-force SQL, reused
    // VERBATIM (same defs entry, zero drift). The snapshot root is
    // wiped per run so the version chain is deterministic.
    QueryDef(
      "q296_ann_index_probe",
      (s, d) => {
        val root = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"),
          s"graft_ivfidx_${Integer.toHexString(d.hashCode)}").toString
        val rootFile = new java.io.File(root)
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        if (rootFile.exists()) rm(rootFile)
        val emb = t(s, d, "embeddings")
          .withColumn("vec", expr("transform(embedding, x -> cast(x as double))"))
          .select("vec_id", "vec")
        Similarity.buildIvfIndex(emb, "vec_id", "vec", root,
          version = 0L, nlist = 8)
        Similarity.probeIvfIndex(root, emb.filter(col("vec_id") < 20),
          "vec_id", "vec", k = 3, nprobe = 8)
      },
      Some(Vectors.defs.find(_.name == "q49_cosine_topk")
        .getOrElse(sys.error("missing q49 twin")).oracle
        .getOrElse(sys.error("q49 has no oracle")))),
  )
}
