package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Seventy-second wave — sampled centrality, mergeable heavy-hitter
  * summaries, and runtime skew handling:
  *
  *  - q382: closeness centrality from hash-selected pivot sources
  *    (Eppstein–Wang shape): multi-source BFS keyed by (source, node)
  *    gives every node its distance to each pivot in diameter-many
  *    keyed-min rounds; closeness is estimated from the pivot
  *    distances only. Exact all-pairs closeness is O(n·m) — the pivot
  *    estimator is THE public scale path, and hash-selected pivots
  *    keep it a pure function of the data (hash-oracle-able).
  *  - q383: Misra–Gries heavy hitters — k counters per partition
  *    (mapPartitions, no shuffle of the stream), summaries merged with
  *    the (k+1)-th-count subtraction rule (mergeable-summaries
  *    guarantee: total undercount ≤ n/k). The DECLARED output is the
  *    guaranteed part: every true heavy hitter (exact count > n/k) is
  *    in the candidate set, and its exact count — recounted over the
  *    CANDIDATE-filtered stream, not a full groupBy — is within the
  *    bound. The q32-family sketch contract: flags pinned TRUE.
  *  - q384: AQE skew-join — a 75%-hot synthetic key joined without
  *    broadcast; adaptive execution detects the oversized partition at
  *    RUNTIME and splits it across tasks (spec pins `isSkew=true` in
  *    the final adaptive plan). At 100 TB this is the difference
  *    between one straggler task owning 75% of the join and the
  *    skewed partition fanning out — with zero query-author salting.
  */
object Training72 {
  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- pivot closeness: sources are the 16 nodes with the smallest
    // md5 rank — a FIXED pivot budget (the Eppstein–Wang estimator's
    // k) so the (source, node) BFS state is 16·n at ANY graph size;
    // a modulo-selected pivot set would grow with the graph and turn
    // the state quadratic (measured: 129 s at 10× before the cap).
    // 4 BFS rounds bound the horizon like q307; nodes score
    // closeness_micro = ⌊1e6·k_reached/Σdist⌋ over reached pivots,
    // ties broken by node id. Each round is one join + keyed min,
    // localCheckpoint'd (the q245 discipline).
    QueryDef(
      "q382_closeness_sampled",
      (s, d) => {
        val und = graft.operators.Graphs.doubled(
          graft.operators.Graphs.coPurchaseEdges(t(s, d, "lineitem")))
          .localCheckpoint()
        val sources = und.select(col("u").as("node")).distinct()
          .orderBy(md5(col("node").cast("string")), col("node"))
          .limit(16)
        var dist = sources.select(col("node").as("src"),
            col("node"), lit(0).as("dist"))
          .localCheckpoint(true)
        for (_ <- 1 to 4) {
          val nxt = und
            .join(dist.withColumnRenamed("node", "u"), "u")
            .select(col("src"), col("v").as("node"),
              (col("dist") + 1).as("dist"))
          dist = dist.unionByName(nxt)
            .groupBy("src", "node").agg(min("dist").as("dist"))
            .localCheckpoint(true)
        }
        dist.filter(col("dist") > 0)
          .groupBy("node")
          .agg(count(lit(1)).as("k_reached"), sum("dist").as("sum_dist"))
          .selectExpr("node", "k_reached", "sum_dist",
            "(1000000 * k_reached) div sum_dist AS closeness_micro")
          .orderBy(col("closeness_micro").desc, col("node"))
          .limit(10)
      },
      Some("""
        WITH RECURSIVE op AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        e AS (
          SELECT DISTINCT a.p AS u, b.p AS v
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
        und AS (
          SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        srcs AS (SELECT u AS s FROM (SELECT DISTINCT u FROM und) n
                 ORDER BY md5(CAST(u AS VARCHAR)), u LIMIT 16),
        walk(src, node, dist) AS (
          SELECT s, s, 0 FROM srcs
          UNION
          SELECT walk.src, und.v, walk.dist + 1
          FROM walk JOIN und ON und.u = walk.node
          WHERE walk.dist < 4),
        best AS (
          SELECT src, node, min(dist) AS dist FROM walk
          GROUP BY src, node)
        SELECT node, CAST(count(*) AS BIGINT) AS k_reached,
               CAST(sum(dist) AS BIGINT) AS sum_dist,
               CAST((1000000 * count(*)) // sum(dist) AS BIGINT)
                 AS closeness_micro
        FROM best WHERE dist > 0
        GROUP BY node
        ORDER BY closeness_micro DESC, node LIMIT 10""")),

    // ---- Misra–Gries: synthetic 75/25 skewed key stream (3 hot keys
    // ≈ 25% each, 997 cold). k = 8 counters/partition; merge = per-key
    // sum then subtract the (k+1)-th largest merged count. The full
    // stream is NEVER shuffled or exactly grouped — only candidate
    // keys (≤ 8) get an exact recount via a pushed-down semi-filter.
    QueryDef(
      "q383_misra_gries_heavy_hitters",
      (s, d) => {
        val k = 8
        import s.implicits._
        val keys = t(s, d, "lineitem")
          .selectExpr("""CASE WHEN l_orderkey % 4 != 0
              THEN concat('hot', CAST(l_orderkey % 3 AS STRING))
              ELSE concat('cold', CAST(l_orderkey % 997 AS STRING)) END
              AS key""")
          .as[String]
        val summaries = keys.mapPartitions { it =>
          val counters = scala.collection.mutable.Map.empty[String, Long]
          it.foreach { key =>
            if (counters.contains(key)) counters(key) += 1L
            else if (counters.size < k) counters(key) = 1L
            else {
              // decrement-all step: evict zeros
              val dead = scala.collection.mutable.ArrayBuffer.empty[String]
              counters.keysIterator.foreach { c =>
                counters(c) -= 1L; if (counters(c) == 0L) dead += c
              }
              dead.foreach(counters.remove)
            }
          }
          counters.iterator.map { case (key, c) => (key, c) }
        }.toDF("key", "cnt")
        // merged candidate set: ≤ k × partitions rows → driver-bounded
        val merged = summaries.groupBy("key").agg(sum("cnt").as("cnt"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val kth = merged.map(_._2).sorted(Ordering[Long].reverse)
          .drop(k).headOption.getOrElse(0L)
        val candidates = merged.filter(_._2 > kth).map(_._1)
        val total = t(s, d, "lineitem").count()
        // exact recount over candidates only (pushed-down IN filter);
        // bound check against the merged estimate: MG never overcounts
        // and the summed per-partition undercount is ≤ n/(k+1) ≤ n/k,
        // so est ≤ exact ≤ est + n/k must hold — emitted as a flag the
        // oracle pins to TRUE (est itself is partition-order dependent
        // and stays out of the declared columns)
        val estDf = s.createDataFrame(merged.toIndexedSeq).toDF("key", "est")
        keys.toDF("key")
          .filter(col("key").isin(candidates.toSeq: _*))
          .groupBy("key").agg(count(lit(1)).as("exact_cnt"))
          .filter(col("exact_cnt") > total / k)
          .join(broadcast(estDf), "key")
          .withColumn("in_candidates", lit(true)) // guaranteed by MG
          .withColumn("bound_ok",
            col("est") <= col("exact_cnt") &&
              col("exact_cnt") - col("est") <= lit(total / k))
          .select("key", "exact_cnt", "in_candidates", "bound_ok")
          .orderBy("key")
      },
      Some("""
        SELECT key, CAST(count(*) AS BIGINT) AS exact_cnt,
               TRUE AS in_candidates, TRUE AS bound_ok
        FROM (
          SELECT CASE WHEN l_orderkey % 4 != 0
                   THEN concat('hot', CAST(l_orderkey % 3 AS VARCHAR))
                   ELSE concat('cold', CAST(l_orderkey % 997 AS VARCHAR))
                 END AS key
          FROM lineitem) t
        GROUP BY key
        HAVING count(*) > (SELECT count(*) // 8 FROM lineitem)
        ORDER BY key""")),

    // ---- AQE skew join: left = lineitem under a 75%-hot key, right =
    // the 1000-key dictionary with an exact aggregate. Broadcast is
    // disabled and the skew thresholds lowered so the optimizer MUST
    // handle the hot partition by splitting it (OptimizeSkewedJoin).
    // The join is materialized eagerly (localCheckpoint) while the
    // confs are active, then they are restored. Declared output: the
    // join census per key decile — pure data, plan-independent.
    QueryDef(
      "q384_aqe_skew_join",
      (s, d) => {
        val conf = s.conf
        val saved = Seq(
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
          .map(key => key -> conf.getOption(key))
        try {
          conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1MB")
          conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
          conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
          skewJoin(s, d).localCheckpoint(true)
        } finally saved.foreach { case (key, v) =>
          v.fold(conf.unset(key))(conf.set(key, _))
        }
      },
      Some("""
        SELECT (k % 10) AS decile, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(rv) AS BIGINT) AS sum_rv_cents,
               CAST(SUM(length(pad)) AS BIGINT) AS pad_chars
        FROM (
          SELECT CASE WHEN l_orderkey % 4 != 0 THEN 0
                      ELSE l_orderkey % 1000 END AS k,
                 md5(CAST(l_orderkey AS VARCHAR)) AS pad
          FROM lineitem) l
        JOIN (
          SELECT o_orderkey % 1000 AS k,
                 SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rv
          FROM orders GROUP BY 1) r USING (k)
        GROUP BY 1 ORDER BY decile""")),
  )

  /** The q384 join body, shared with the spec (which re-runs it under
    * the same confs to inspect the final adaptive plan for the skew
    * split).
    */
  def skewJoin(s: SparkSession, d: String): DataFrame = {
    // the md5 pad keeps the hot partition INCOMPRESSIBLE: a bare
    // constant-key column lz4-compresses to nothing in the shuffle
    // files and AQE (which reads compressed map sizes) would never see
    // the skew; consumed downstream so it cannot be pruned
    // repartition models the many-mapper reality of a big input: AQE
    // splits a skewed REDUCE partition by assigning mapper subsets to
    // separate tasks, so a single-file local input (1 mapper) is
    // structurally unsplittable — at 100 TB the scan has thousands of
    // mappers and this is a no-op cost-wise
    val left = t(s, d, "lineitem").repartition(32).selectExpr(
      "CASE WHEN l_orderkey % 4 != 0 THEN 0 ELSE l_orderkey % 1000 END AS k",
      "md5(CAST(l_orderkey AS STRING)) AS pad")
    // the dictionary is materialized BEFORE the join: OptimizeSkewedJoin
    // pattern-matches SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) and an
    // aggregate sitting between the right shuffle and the join would
    // disqualify the split
    val right = t(s, d, "orders")
      .groupBy(expr("o_orderkey % 1000").as("k"))
      .agg(expr("SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))")
        .as("rv"))
      .localCheckpoint(true)
    left.join(right, "k")
      .groupBy(expr("k % 10").as("decile"))
      .agg(count(lit(1)).as("n"), sum("rv").as("sum_rv_cents"),
        sum(length(col("pad"))).as("pad_chars"))
      .orderBy("decile")
  }
}
