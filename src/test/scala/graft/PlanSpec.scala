package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Physical-plan regression gate: the properties that make these plans
  * survive a 100x scale-up — filter pushdown into parquet, column
  * pruning, broadcast dimension joins, keyed (never single-partition)
  * windows — asserted against .explain output so a refactor can't
  * silently lose them.
  */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q01: shipdate filter is pushed into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q01: scan reads only the needed columns") {
    val p = plan("q01_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"), readSchema) // unused key pruned
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_shipdate"), readSchema)
  }

  test("q03: dimension joins broadcast") {
    val p = plan("q03_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("q22: final plan is ONE scan + ONE literal-bounds broadcast join (no pass recompute)") {
    // The dispatched form (harness scale sits under spark.graft.iqr.
    // localLimit) carries the driver-replayed bounds as a SINGLE
    // combined literal table: one parquet scan, one broadcast join,
    // both passes' conjuncts folded into the join/filter — where the
    // distributed form is one join per pass.
    // simple mode lists each node once (formatted repeats them in the detail section)
    val p = SparkEntry.queries("q22_iqr_outlier_filter")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("BroadcastHashJoin".r.findAllIn(p).size === 1, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert("LocalTableScan".r.findAllIn(p).size === 1, p)
  }

  test("windows are keyed — no single-partition exchange anywhere") {
    for (q <- Seq("q07_window_topk", "q08_running_total", "q28_asof_join", "q30_sessionization")) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("q46: LSH pair join is an equi-join (shuffle on band key), not nested-loop") {
    val p = plan("q46_minhash_pairs")
    assert(!p.contains("NestedLoop"), p)
  }

  test("q49 native cosine stays inside whole-stage codegen spans") {
    val df = SparkEntry.queries("q49_cosine_topk")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("graft_cosine"), p)
  }

  test("q72: bloom pre-filter sits on the fact scan, semi-join is hash not NLJ") {
    val df = SparkEntry.queries("q72_bloom_semi_join")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("UDF"), s"bloom mightContain filter missing from plan:\n$p")
    assert(!p.contains("NestedLoop"), p)
  }

  test("q85: bucket-decomposed interval join is an equi-join, not NLJ") {
    val df = SparkEntry.queries("q85_interval_join")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("NestedLoop"), p)
  }

  test("q74: corpus stats (N/df/avgdl) join back by broadcast, not shuffle") {
    val df = SparkEntry.queries("q74_bm25")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q91: global equi-depth bins without a global sort; boundaries broadcast") {
    val p = plan("q91_global_equidepth")
    // a global ntile would need range partitioning + a total sort; the
    // boundary+comparison formulation must never introduce one
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q93/q94: sampling and packing windows are keyed — no single-partition exchange") {
    for (q <- Seq("q93_stratified_sample", "q94_sequence_packing")) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("q93: the wide text column never reaches the scan (metadata-only sample)") {
    val p = plan("q93_stratified_sample")
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty, p)
    assert(readSchemas.forall(!_.contains("text")), readSchemas.mkString("\n"))
  }

  test("q98: global top-k is TakeOrdered (per-partition top-k), not a global sort") {
    val df = SparkEntry.queries("q98_vocab_topk")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q105: hot-chunk filter and reassembly stay keyed — no NLJ, no global window") {
    val p = plan("q105_line_dedup")
    assert(!p.contains("NestedLoop"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q106: weighted sample is TakeOrdered, never a global sort") {
    val df = SparkEntry.queries("q106_weighted_sample")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q107: all 15 moments come from ONE scan of the fact table") {
    val p = SparkEntry.queries("q107_corr_matrix")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    val readSchema = SparkEntry.queries("q107_corr_matrix")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
      .linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"), readSchema) // only the 4 measures read
  }

  test("q109: every PageRank round is an equi-join, never NLJ or cartesian") {
    val p = plan("q109_pagerank")
    assert(!p.contains("NestedLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q117: the vocabulary and total join back by broadcast, not shuffle") {
    val p = SparkEntry.queries("q117_unigram_surprisal")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("BroadcastHashJoin|BroadcastNestedLoop".r.findAllIn(p).size >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p) // top-25, never a global sort
  }

  test("q120: topic tagging is map-only — zero exchanges, zero joins") {
    val p = SparkEntry.queries("q120_topic_tag")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("q126: the trained vocabulary applies as a broadcast join over the word stream") {
    val p = SparkEntry.queries("q126_bpe_encode")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q116: chunking is map-only (explode, no exchange before the output)") {
    val p = SparkEntry.queries("q116_rag_chunks")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange"), p)
  }

  test("q135: PII scrub is map-only regex work — no joins, one agg exchange") {
    val p = SparkEntry.queries("q135_pii_redaction")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size === 1, p)
  }

  test("q136: entropy top-25 is TakeOrdered, and every window/agg is keyed") {
    val p = SparkEntry.queries("q136_char_entropy")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q137: anchors broadcast; the sample window is keyed, never single-partition") {
    val p = SparkEntry.queries("q137_negative_sampling")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q144: interpolation windows are keyed by user; no cartesian product") {
    val p = SparkEntry.queries("q144_interpolate")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("CartesianProduct"), p)
    // every window must partition by user_id (a global window would be
    // the scale-killer here)
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p)
    windows.foreach(w => assert(w.contains("user_id"), w))
    // the ONLY single-partition exchange allowed is the 1-row global
    // min/max bounds scalar aggregate (2 partial rows -> 1 scalar)
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 1, p)
  }

  test("q147: both retrieval sides broadcast their query set; fusion windows are keyed") {
    val p = SparkEntry.queries("q147_rrf_fusion")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    // the query sets (3 rows each) must join by broadcast, never shuffle
    // the corpus on a non-key
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size === 2, p)
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p)
    windows.foreach(w => assert(w.contains("query_id"), w))
  }

  test("q148: PSI is two fact passes + broadcast boundaries, no data-sized window") {
    val p = SparkEntry.queries("q148_psi_drift")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // decile boundaries and totals reach the fold by broadcast
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p)
    // no window at all — the bucket fold is a groupBy, cumulative logic
    // never touches row space
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q150: vocabulary joins broadcast; the pair join is an equi-join on doc_id") {
    val p = SparkEntry.queries("q150_pmi_pairs")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("NestedLoop") || p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
    // df-capped vocab is a broadcast join on both arms of the self-join
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    // global top-20 is TakeOrdered, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q151: attribution joins on the user key; windows keyed by purchase") {
    val p = SparkEntry.queries("q151_attribution")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p)
    windows.foreach(w => assert(w.contains("pid"), w))
  }

  test("q152: skyline's only data-sized pass is the agg; verify join is broadcast") {
    val p = SparkEntry.queries("q152_skyline")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the dominance verify must be a broadcast NLJ over the pruned
    // candidates, never a shuffle/cartesian over the full input
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // both arms of the verify join read the checkpointed candidate set —
    // the agg+prune pipeline (and its parquet scan) ran exactly once
    assert("Scan parquet".r.findAllIn(p).isEmpty, p)
    assert("Scan ExistingRDD".r.findAllIn(p).size === 2, p)
  }

  test("q154/q156: the only data-sized pass is the keyed agg; windows run on day tables") {
    for (q <- Seq("q154_cusum_changepoint", "q156_hll_merge")) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("q157: the data-sized digit agg runs once; total folds the checkpointed 9 rows") {
    val p = SparkEntry.queries("q157_benford")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // both branches read the checkpointed digit table — the parquet
    // scan + digit aggregation ran exactly once, at checkpoint time
    assert("Scan parquet".r.findAllIn(p).isEmpty, p)
    assert("Scan ExistingRDD".r.findAllIn(p).size === 2, p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q162: the last-view window is keyed by user; no self-join, no cartesian") {
    val p = SparkEntry.queries("q162_conversion_lag")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("Join"), p) // one window pass, zero joins
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p)
    windows.foreach(w => assert(w.contains("user_id"), w))
  }

  test("q158: the degree tail comes from TakeOrdered, never a global sort") {
    val deg = Tables(spark, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(countDistinct("l_partkey").as("degree"))
      .orderBy(col("degree").desc, col("l_suppkey").asc).limit(50)
    val p = deg.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q153: weighted-median windows are keyed by return flag") {
    val p = SparkEntry.queries("q153_weighted_median")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange SinglePartition"), p)
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p)
    windows.foreach(w => assert(w.contains("l_returnflag"), w))
  }

  test("q182: the word self-join is an equi-join; size lookups broadcast") {
    val p = SparkEntry.queries("q182_vocab_overlap")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // per-word fan-out is bounded by #sources, so the pair join must be
    // a hash equi-join on the word — never a cartesian/NLJ
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastExchange"), p) // the 20-row size frames
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q184/q185: the only data-sized pass is the confusion-matrix agg") {
    for (q <- Seq("q184_lang_kappa", "q185_lang_prf")) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      // every scan is the checkpointed ≤classes² confusion matrix — the
      // documents scan + marker scoring ran exactly once
      assert("Scan parquet".r.findAllIn(p).isEmpty, s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("windowspecdefinition"), s"$q:\n$p")
    }
  }

  test("q186: dispersion is two keyed aggs — no window, no join") {
    val p = SparkEntry.queries("q186_event_dispersion")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Join"), p)
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q199: LATERAL decorrelates to a group-limit window + broadcast, never a per-row re-scan") {
    val p = SparkEntry.queries("q199_lateral_topk")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // WindowGroupLimit = the top-3 prunes map-side BEFORE the shuffle;
    // the nation side broadcasts; a correlated-loop plan would show a
    // nested-loop or cartesian join.
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("q200: recursion is a UnionLoop fixpoint feeding one keyed agg") {
    // the declared query checkpoints eagerly (so it can restore the
    // recursion row guard) — inspect the pre-execution plan instead
    val (df, restore) = graft.queries.Training16.q200Plan(spark, dir)
    try {
      val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(p.contains("UnionLoop"), p)
      assert(!p.contains("Exchange SinglePartition"), p)
    } finally restore()
  }

  test("q201: islands are ONE keyed exchange — windows and both aggs reuse it") {
    val p = SparkEntry.queries("q201_interval_islands")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("Join"), p)
  }

  test("q202: listagg is keyed and the top-3 prunes map-side (partial WindowGroupLimit)") {
    val p = SparkEntry.queries("q202_listagg_top_langs")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q203: try_divide stays map-only into one agg exchange") {
    val p = SparkEntry.queries("q203_try_arithmetic")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q204: null-safe join hashes (coalesce, isnull) keys — broadcast, no NLJ") {
    val p = SparkEntry.queries("q204_nullsafe_join")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("isnull"), p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("q205: gap census is equi-joins + aggs — no window, no global sort") {
    val p = SparkEntry.queries("q205_sequence_gaps")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the successor test must be a hash anti-join on the id key, never a
    // data-sized window (the naive LAG-over-ids plan is one partition);
    // the only NLJ is the 1-row × 1-row stat cross at the very top.
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("EqualTo(event_type,click)"), s"filter not pushed:\n$p")
  }

  test("q206: TWA is ONE keyed window exchange into a keyed agg") {
    val p = SparkEntry.queries("q206_time_weighted_avg")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("q207: source lookups are hash joins; candidate join is banded equi") {
    val p = SparkEntry.queries("q207_cross_source_neardup")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
  }

  test("q208: prefix join is an equi-join on the token hash; verify is candidate-bounded") {
    val p = SparkEntry.queries("q208_prefix_filter_join")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q209: MaxSim is one codegen'd fold per candidate row — no explode, keyed top-k") {
    val p = SparkEntry.queries("q209_maxsim_late_interaction")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // brute-force scoring broadcasts the (bounded) query side by
    // design — the scale swap is the ANN candidate generator; what must
    // hold is: no Generate/explode of the 4x4 similarity matrix, and
    // the per-query top-k window stays keyed.
    assert(!p.contains("Generate"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // documented baseline shape
  }

  test("q210/q212: reciprocal and vote joins are hash equi-joins over top-k lists") {
    for (name <- Seq("q210_mutual_knn", "q212_knn_label_audit")) {
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!p.contains("Exchange SinglePartition"), s"$name:\n$p")
      // exactly one non-equi join (the brute-force scorer); everything
      // downstream of the top-k lists joins by key
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, s"$name:\n$p")
    }
  }

  test("q214: run-length encoding is one keyed window pass — no join, never single-partition") {
    val p = SparkEntry.queries("q214_event_runs")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q215: funnel is keyed aggs + equi-joins — no window over raw events, no NLJ") {
    val p = SparkEntry.queries("q215_constrained_funnel")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    assert(p.contains("EqualTo(event_type,"), s"type filter not pushed:\n$p")
  }

  test("q216: price audit is one shuffle join on the order key; scans prune columns") {
    val p = SparkEntry.queries("q216_price_audit")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    val lineSchema = p.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("l_extendedprice"))
    assert(lineSchema.exists(!_.contains("l_shipdate")),
      s"lineitem scan should prune unused columns:\n$p")
  }

  test("q218: both sampled sides filter before the hash join — no NLJ anywhere") {
    val p = SparkEntry.queries("q218_join_card_estimate")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("NestedLoop") || // 1-row × 1-row stat cross only
      "BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Cartesian"), p)
    assert("% 16\\) = 0".r.findAllIn(p).size >= 2,
      s"slice predicate should sit on both scans:\n$p")
  }

  test("q220: snapshot diff is one full-outer equi-join, column-pruned scans") {
    val p = SparkEntry.queries("q220_snapshot_diff")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("q221: term filter sits under the explode before any shuffle; intersection is keyed") {
    val p = SparkEntry.queries("q221_conjunctive_search")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("Filter w#") || p.contains("IN (join,merge,window)") ||
      p.contains("w#"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("q222: binning is a broadcast fold — no sort, no global window") {
    val p = SparkEntry.queries("q222_source_decile_mix")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p) // 1-row bounds broadcast
  }

  test("q223: top-20 is TakeOrdered over the wedge-bounded pair table, all joins equi") {
    val p = SparkEntry.queries("q223_link_prediction")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("q224: disorder profile is one keyed window — no join, never single-partition") {
    val p = SparkEntry.queries("q224_disorder_profile")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q231: candidate generation is a banded equi-join; top-20 is TakeOrdered; no NLJ") {
    val p = SparkEntry.queries("q231_link_prediction_minhash")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("q233: CDC is ONE full-outer equi-join on the key; unchanged mass filtered in-join") {
    val p = SparkEntry.queries("q233_table_changes")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("FullOuter"), p)
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size === 1, p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("q235: DSIR bucket-LLR joins back by broadcast; no cartesian") {
    val p = SparkEntry.queries("q235_dsir_importance")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // ≥2 broadcast hash joins (token→lr scoring + raw←target bucket
    // merge); the only nested-loop is the broadcast-SCALAR cross with
    // the 1-row totals frame (the blessed pattern), never a cartesian
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q236: projection is pure codegen arithmetic (no UDF); pair join broadcasts the bounded sample") {
    val p = SparkEntry.queries("q236_random_projection")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("ScalaUDF"), p)
    // the non-equi pair join is allowed to be a nested-loop ONLY
    // because the sampled side is bounded and broadcast
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q237/q238: chunking and run-audit windows are keyed — never single-partition") {
    for (q <- Seq("q237_cdc_chunk_dedup", "q238_shuffle_run_audit")) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("q241: calibration is ONE scan into one agg pass") {
    val p = SparkEntry.queries("q241_calibration_bins")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q246: the session variable folds to a literal and pushes into the scan") {
    val p = SparkEntry.queries("q246_session_variables")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice"), p)
  }

  test("q250: skip-gram window join is an equi-join; the frequency table broadcasts") {
    val p = SparkEntry.queries("q250_skipgram_pairs")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("NestedLoop"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q251: encode pass is broadcast-only (no shuffle-family join) and top-20 is TakeOrdered") {
    val p = SparkEntry.queries("q251_target_encoding")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q252: the per-type k-smallest prunes map-side (WindowGroupLimit)") {
    val p = SparkEntry.queries("q252_kmv_intersection")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q254: every contract leg is a single agg; the FK check is the only join") {
    val p = SparkEntry.queries("q254_data_contracts")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("NestedLoop"), p)
    assert("Join".r.findAllIn(p).size <= 2, p) // FK leg only (AQE may print it twice)
  }

  test("q255: the only unkeyed window runs over the value dictionary, not the data") {
    val df = SparkEntry.queries("q255_quantile_normalize")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // the per-source rank is keyed; the lookup is a broadcast array
    // fold (no data-sized sort anywhere): exactly one Sort feeding the
    // dictionary cum window plus the keyed rank sort
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q257: the audit is centroid-broadcast + map-side argmin — no shuffle-family join") {
    val p = SparkEntry.queries("q257_centroid_label_audit")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q258: the (group,value) dictionary is checkpointed — no fact re-scan, no shuffle join") {
    val p = SparkEntry.queries("q258_kruskal_wallis")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q259: JSD grid joins are broadcast — no shuffle-family join") {
    val p = SparkEntry.queries("q259_js_divergence")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("q260: the day series is checkpointed (no event re-scan); top-10 is TakeOrdered") {
    val p = SparkEntry.queries("q260_seasonal_decompose")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // events is read once into the checkpointed day dictionary; the
    // decomposition plan itself touches no parquet at all
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q261: degree tables broadcast onto the edge stream; no NLJ") {
    val p = SparkEntry.queries("q261_assortativity")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("NestedLoop"), p)
  }

  test("q262: pivot/unpivot runs over the month dictionary; the MoM window is keyed by status") {
    val p = SparkEntry.queries("q262_sql_pivot_unpivot")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q263: dims broadcast onto the fact; sufficient statistics are map-side combined") {
    val p = SparkEntry.queries("q263_grouped_trend")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("q264: sliding distinct is explode + keyed distinct — no window function at all") {
    val p = SparkEntry.queries("q264_sliding_distinct")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Window"), p)
    assert(p.contains("Generate explode"), p)
  }

  test("q265: the first-3 window prunes map-side; top-10 is TakeOrdered") {
    val p = SparkEntry.queries("q265_top_paths")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q266: the fit runs on the checkpointed bin dictionary — no fact re-scan") {
    val p = SparkEntry.queries("q266_isotonic_calibration")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q267: the subset lattice joins broadcast; the data pass is one keyed agg") {
    val p = SparkEntry.queries("q267_shapley_attribution")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("q268: the slice report is ONE scan into one agg — no joins") {
    val p = SparkEntry.queries("q268_wilson_intervals")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q269: every PPR round is an equi-join, never NLJ or cartesian") {
    val p = SparkEntry.queries("q269_personalized_pagerank")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("q270: both selection passes read the checkpointed score frame — no re-scan, no SMJ") {
    val p = SparkEntry.queries("q270_conformal_threshold")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q271: clustering runs on the checkpointed cell dictionary — no data re-scan") {
    val p = SparkEntry.queries("q271_grid_density_clusters")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
  }

  test("q272: the skew report runs on the checkpointed vocabulary; top-10 is TakeOrdered") {
    val p = SparkEntry.queries("q272_skew_diagnosis")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q273: all count-table joins broadcast — no shuffle-family join") {
    val p = SparkEntry.queries("q273_stupid_backoff")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q274: every greedy round reads the checkpointed (doc,shingle) table — no re-scan") {
    val p = SparkEntry.queries("q274_greedy_set_cover")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the declared frame is the driver-assembled selection trace; the
    // heavy work ran against the checkpointed distinct table
    assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD"), p)
  }

  test("q275/q276: features, labels and DiD groups are keyed aggs — no NLJ, no global window") {
    val p275 = SparkEntry.queries("q275_point_in_time_features")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p275.contains("Exchange SinglePartition"), p275)
    assert(!p275.contains("CartesianProduct"), p275)
    // q276's only global agg folds the checkpointed 4-row group frame
    // into the DiD scalar — dictionary-sized by construction; the gate
    // is that the USER-keyed passes shuffle on the key, not globally
    // q276's declared plan reads the checkpointed 4-row group frame
    // (the user-keyed shuffles ran at checkpoint time); the residual
    // plan must be dictionary work only — no parquet, no cartesian
    val p276 = SparkEntry.queries("q276_diff_in_diff")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p276.contains("CartesianProduct"), p276)
    assert("Scan parquet".r.findAllIn(p276).size === 0, p276)
  }

  test("q277: both eval sides are bounded-query paths; the overlap is a semi-join") {
    val p = SparkEntry.queries("q277_ann_recall_eval")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q278: the mechanism + debias is ONE scan into one agg") {
    val p = SparkEntry.queries("q278_randomized_response")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q279: the fairness report is dims-broadcast + one keyed agg") {
    val p = SparkEntry.queries("q279_fairness_report")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q280: bucket digests are one map-side keyed agg; the root reads the 64-row dictionary") {
    val p = SparkEntry.queries("q280_merkle_digest")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p) // checkpointed dictionary
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q281: the LTV window is keyed by cohort; cohort map broadcast") {
    val p = SparkEntry.queries("q281_cohort_ltv")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q282: the joint histogram is ONE scan into a checkpointed 100-key dictionary") {
    val p = SparkEntry.queries("q282_joint_histogram")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the scan ran once at checkpoint time; the declared plan is
    // dictionary work (the total derives from the dictionary itself)
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q283: the data pass is a keyed transition window; the chain runs on the dictionary") {
    val p = SparkEntry.queries("q283_markov_absorption")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // declared frame is the driver-iterated 5-row result
    assert(p.contains("LocalTableScan"), p)
  }

  test("q284: the decomposition is ONE keyed agg over orders") {
    val p = SparkEntry.queries("q284_price_volume_mix")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q285: the backtest reads the checkpointed day dictionary — no event re-scan") {
    val p = SparkEntry.queries("q285_seasonal_naive_backtest")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
  }

  test("q286: probe candidates join by bucket key on the checkpointed index — no NLJ, no re-scan") {
    val p = SparkEntry.queries("q286_multiprobe_recall")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q287: the entropy chain runs on the checkpointed 5x5 dictionary") {
    val p = SparkEntry.queries("q287_markov_entropy_rate")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q288: GROUP BY ALL compiles to one keyed agg — one scan, no join") {
    val p = SparkEntry.queries("q288_group_by_all")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q289: the fold rank window is keyed by label — never single-partition") {
    val p = SparkEntry.queries("q289_stratified_kfold")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("hashpartitioning(label"), p)
  }

  test("q290/q291/q293: monitoring and eval sweeps are single keyed-agg passes") {
    for (qn <- Seq("q290_daily_quantile_bands", "q291_dispersion_index")) {
      val p = SparkEntry.queries(qn)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      assert("Scan parquet".r.findAllIn(p).size === 1, s"$qn:\n$p")
      assert(!p.contains("Join"), s"$qn:\n$p")
    }
    val p293 = SparkEntry.queries("q293_pr_curve")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p293).size === 1, p293)
    assert(!p293.contains("SortMergeJoin"), p293)
  }

  test("q292: two-phase ranks — no window function, no global funnel, top-10 is TakeOrdered") {
    val p = SparkEntry.queries("q292_rank_movers")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // the two global row_number windows are gone — ScalableRank ranks by
    // range-partition + local sort + broadcast offsets
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q407: deciles come from the two-phase rank — no ntile window, no global funnel") {
    val p = SparkEntry.queries("q407_uplift_deciles")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q308/q389/q427: prefix sums are two-phase — every window keyed by the range id") {
    // the cumulative weight runs over a data-sized dimension (part /
    // customer) in all three; the only windows the declared plans may
    // carry are partition-LOCAL running sums keyed by __sr_pid, and the
    // only single-partition exchanges the bounded scalar aggregates
    // (total weight / capacity / n_cust — ≤ partition-count partial
    // rows each, the q144 allowance)
    for ((q, scalarAggs) <- Seq(
        "q308_pps_systematic_sample" -> 1,
        "q389_horvitz_thompson" -> 2,
        "q427_maxmin_fair_allocation" -> 3,
        // the compaction manifest is harness-modeled as l_orderkey/100
        // (data-scaled), so its running total is two-phase as well
        "q196_compaction_plan" -> 0)) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      assert("Exchange SinglePartition".r.findAllIn(p).size <= scalarAggs,
        s"$q:\n$p")
      val windows =
        p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
      assert(windows.nonEmpty, s"$q:\n$p")
      windows.foreach(w => assert(w.contains("__sr_pid"), s"$q: $w"))
    }
  }

  test("dictionary midranks/ranks are two-phase — q173/q174/q177/q217/q331/q415") {
    // value-dictionary cumulative windows (q436 class) and dimension
    // ranks (q292 class), all moved onto ScalableRank: any window the
    // declared plans carry must be keyed by the range partition id;
    // single-partition exchanges only for bounded scalar aggregates
    for ((q, scalarAggs) <- Seq(
        "q173_mwu_auc" -> 1,
        "q174_spearman" -> 1,
        "q177_concentration" -> 2,
        "q217_vocab_coverage" -> 1,
        "q331_mann_whitney" -> 1)) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      assert("Exchange SinglePartition".r.findAllIn(p).size <= scalarAggs,
        s"$q:\n$p")
      p.linesIterator.filter(_.contains("windowspecdefinition"))
        .foreach(w => assert(w.contains("__sr_pid"), s"$q: $w"))
    }
    // q415: only the 5 winners are ranked — TakeOrdered + broadcast,
    // the one remaining window runs over exactly those 5 rows
    val p415 = SparkEntry.queries("q415_topn_other_rollup")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p415.contains("TakeOrderedAndProject"), p415)
    assert(p415.contains("BroadcastHashJoin"), p415)
    assert("Exchange SinglePartition".r.findAllIn(p415).size <= 1, p415)
    // q454: customer-spend rank+cumsum is two-phase; the only
    // unpartitioned window left is the 20-row ventile-curve lag
    val p454 = SparkEntry.queries("q454_lorenz_gini")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    val w454 =
      p454.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(w454.exists(_.contains("__sr_pid")), p454)
    assert(w454.count(w => !w.contains("__sr_pid")) <= 1, p454)
    // q487: the declared plan (literal-bounds assignment census) carries
    // no window at all — the sample rank ran two-phase, bounds-collected
    val p487 = SparkEntry.queries("q487_range_partitioner_balance")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p487.contains("windowspecdefinition"), p487)
  }

  test("q253: bucketed layout co-locates the join — zero exchanges below the SortMergeJoin") {
    val p = SparkEntry.queries("q253_bucketed_join")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("SortMergeJoin"), p)
    val joinSection = p.split("SortMergeJoin").last
    assert(!joinSection.contains("Exchange"), p)
  }

  test("q294/q295: the declared twins carry NO exact percentile — sketch agg only") {
    // q295's sketch agg is visible in the returned plan; q294's runs
    // eagerly behind the bucket-table localCheckpoint, so its final
    // plan is checked only for the absence of an exact-percentile
    // fallback (the bucket table it aggregates is 400 rows).
    val p295 = SparkEntry.queries("q295_quantile_bands_tdigest")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p295.contains("approx_percentile"), p295)
    for (qn <- Seq("q294_ks_drift_tdigest", "q295_quantile_bands_tdigest")) {
      val p = SparkEntry.queries(qn)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!p.replace("approx_percentile", "").contains("percentile("),
        s"$qn declared plan must not fall back to exact percentile:\n$p")
    }
  }

  test("q296: the probe plan reads the STORED index, no quantizer fit in-plan") {
    val p = SparkEntry.queries("q296_ann_index_probe")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // lists + centroids parquet scans of the persisted artifact
    assert("Scan parquet".r.findAllIn(p).size >= 2, p)
    assert(p.contains("graft_cosine"), p)
  }

  test("q301: median/MAD bounds broadcast back — no sort-merge join on the fact") {
    val p = SparkEntry.queries("q301_mad_outliers")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q303/q309/q310: imputation and batch windows stay keyed — no single-partition exchange") {
    for (qn <- Seq("q303_locf_impute", "q309_batch_time_window",
        "q310_batch_session_window")) {
      val p = SparkEntry.queries(qn)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("Exchange SinglePartition"), s"$qn:\n$p")
    }
  }

  test("q306: chunking is a generate pass — no joins, one scan") {
    val p = SparkEntry.queries("q306_rag_chunking")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert(p.contains("Generate"), p)
    assert(!p.contains("Join"), p)
  }

  test("q312: bitmap distinct partial-aggregates — no raw-key distinct exchange") {
    val p = SparkEntry.queries("q312_bitmap_distinct")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("bitmap_construct_agg") || p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q347/q348: fuzzy and proximity joins are EQUI joins — no cartesian pair scan") {
    for (q <- Seq("q347_deletion_neighborhood_join", "q348_grid_proximity_join")) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      // the all-pairs compare these blocking schemes replace would show
      // up as a CartesianProduct; the only nested-loop allowed is the
      // 9-row broadcast offsets frame (q348's cell fan-out)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("q350: canonical-selection window is cluster-keyed, no single-partition exchange") {
    val p = SparkEntry.queries("q350_dedup_canonical_quality")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q369/q370: MV rewrite fires on the match and ONLY on the match") {
    // q369's physical plan must read the MV summary, never the corpus
    val fired = SparkEntry.queries("q369_materialized_view_rewrite")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(fired.contains("graft_mv_docs"), fired)
    assert(!fired.contains("documents.parquet"), fired)
    // q370 (filtered) must fall back to the base scan
    val guarded = SparkEntry.queries("q370_materialized_view_guard")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(guarded.contains("documents.parquet"), guarded)
    assert(!guarded.contains("graft_mv_docs"), guarded)
  }

  test("q438: the Yannakakis reducer really plans semi-joins before the join") {
    val p = SparkEntry.queries("q438_yannakakis_reducer")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("LeftSemi".r.findAllIn(p).size >= 3, p)
  }

  test("q430: ring lookup is join-free (literal CASE tree) and prunes to the key") {
    val p = plan("q430_consistent_hash_ring")
    assert(!p.contains("Join"), p) // both ring assignments are per-row expressions
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("o_orderkey") && !readSchema.contains("o_totalprice"),
      readSchema)
  }

  test("q436: declared plan is one agg over the checkpointed cents — no window, no join") {
    // the quantile selection ran at build time via the bucket-histogram
    // two-pass (q270 discipline); the declared frame folds literal
    // bounds over the checkpointed scan
    val p = SparkEntry.queries("q436_winsorized_stats")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("Join"), p)
  }

  test("q490: contract audit reads the checkpointed scan — no parquet re-scan, no window, no cartesian") {
    val p = SparkEntry.queries("q490_iqr_approx_contract")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 0, p)
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q491: no pair join at all — no NLJ/cartesian, windows only range-pid-keyed") {
    // the production twin's whole point is that it never forms an
    // overlap pair: the plan must carry no nested-loop or cartesian
    // join, and its only windows are the two-phase prefix pass's
    // __sr_pid-partitioned ones (never a global window)
    val p = SparkEntry.queries("q491_interval_overlap")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p)
    windows.foreach(w => assert(w.contains("__sr_pid"), w))
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("r10 quadratic closures: plan shapes stay scale-safe") {
    // q470: the per-user top-3 is pruned MAP-SIDE (WindowGroupLimit
    // partial) before the one user shuffle, and nothing funnels through
    // a single partition
    val p470 = plan("q470_item_cf_recs")
    assert(p470.contains("WindowGroupLimit"), p470)
    assert(!p470.contains("Exchange SinglePartition"), p470)
    // q443: top-20 rules ride TakeOrderedAndProject (map-side partial
    // heaps), never a global sort
    val p443 = plan("q443_association_rules")
    assert(p443.contains("TakeOrderedAndProject"), p443)
    assert(!p443.contains("Exchange SinglePartition"), p443)
    // q433: the adaptive-block pair join stays an equi-join on the
    // derived key — no cartesian product anywhere
    val p433 = plan("q433_fellegi_sunter_linkage")
    assert(!p433.contains("CartesianProduct"), p433)
    // q255: the order-statistic lookup is a literal expression — no
    // per-row join, no single-partition exchange for the dictionary
    val p255 = plan("q255_quantile_normalize")
    assert(!p255.contains("Exchange SinglePartition"), p255)
  }
}
