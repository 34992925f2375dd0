package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Twenty-second wave: graph features and stream operations. q223 is
  * link prediction by common-neighbor Jaccard over the co-purchase
  * graph — the classic "customers who bought X also bought Y"
  * candidate generator, computed the wedge way (pairs sharing a
  * neighbor) so similarity never enumerates node pairs. q224 is the
  * event-time disorder profile: per user, how late do events arrive
  * relative to the running event-time maximum — the exact table a
  * Structured Streaming watermark delay is sized from (the engine's
  * withWatermark ops in q29/q30/q80 consume the bound this query
  * measures).
  *
  * Scale shapes: q223's wedge join fans out Σ deg(w)² over common
  * neighbors — bounded here by order sizes; on a power-law graph the
  * hot-neighbor cap discipline of Dedup.jaccardPairs applies
  * unchanged (drop ws above a degree cap before the join). The final
  * top-20 is TakeOrdered, never a global sort. q224 is ONE keyed
  * window pass.
  */
object Training22 {
  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- common-neighbor Jaccard link prediction: undirected
    // co-purchase edges (parts sharing an order), neighbor sets per
    // node, candidate pairs = nodes at distance 2 (sharing ≥1
    // neighbor), scored |N∩|/|N∪|. Edges materialize once; the wedge
    // join runs on the doubled edge list; top-20 by (score, u, v) is
    // deterministic and TakeOrdered-planned.
    //
    // Scale posture (the wedge mass Σ_w deg(w)² is the resource):
    //   (1) hub-witness cap — witnesses w with deg(w) > 512 are dropped
    //       before the wedge join (the jaccardPairs df-cap discipline:
    //       a hub contributes deg² wedges and near-zero Jaccard signal).
    //       512 is above the harness max degree (222 at sf0.1), so no
    //       row is dropped here and the oracle is the uncapped form.
    //   (2) mass-sized pair shuffle — deg gives Σ deg² EXACTLY for one
    //       scalar agg; the pair count is ≈ wedges/1.46 on this graph
    //       (measured), so partial aggregation cannot compress the
    //       stream and the session's 32 agg partitions would hold 30M+
    //       entries each at 10× (the r6 shape spilled, then OOM'd an
    //       8 GB JVM). The wedge stream therefore shuffles on the pair
    //       key at ~1.5M pairs/task and the degree table broadcasts —
    //       no hash map ever exceeds task memory. Measured at 10×
    //       (ScaleCheck, 2026-08): 18.2s → 330s = 18.2× — 10× wedge
    //       mass plus the 1.5B-row pair shuffle outgrowing one box's
    //       page cache; completes without OOM, cores saturated at both
    //       scales. On a real cluster the same plan spreads the shuffle
    //       over N machines' disks.
    //   The sub-linear path for the dense regime is the minhashed-
    //   neighborhood variant, declared as q231 (neighbor-set signatures
    //   through the q46 band join, exact verify on candidates only):
    //   measured 2.8× at 10× on the same harness — THAT is the form
    //   whose candidate mass stays bounded at 100 TB.
    QueryDef(
      "q223_link_prediction",
      (s, d) => {
        // shared localCheckpoint'd edge build — und + deg + wedges all
        // read it (graft.operators.Graphs.coPurchaseEdges)
        val e = graft.operators.Graphs.coPurchaseEdges(t(s, d, "lineitem"))
        val und = graft.operators.Graphs.doubled(e)
        // SCALE-DISPATCHED (round-8): the operator measures Σ deg(w)²
        // with the scalar agg it needs anyway to size the pair shuffle
        // and routes — exact wedge enumeration below the wedge-mass
        // limit (this harness scale: mass ~3×10⁷ at sf0.1, so the
        // oracle-truth exact branch runs here), minhashed neighborhoods
        // (the q231 form, 2.8× at 10× vs exact's 18.2×) above it. A
        // user calling the declared default no longer gets the 354 s
        // form on a dense graph; the exact plan's shuffle-sizing and
        // hub-witness-cap discipline lives in LinkPrediction.exactTopK.
        graft.operators.LinkPrediction.topK(und, k = 20, degCap = 512)
      },
      Some("""
        WITH op AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        e AS (
          SELECT DISTINCT a.p AS u, b.p AS v
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
        und AS (
          SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        deg AS (SELECT u AS n, count(*) AS dg FROM und GROUP BY 1),
        common AS (
          SELECT x.u AS pu, y.u AS pv, count(*) AS cmn
          FROM und x JOIN und y ON x.v = y.v AND x.u < y.u
          GROUP BY 1, 2)
        SELECT pu AS u, pv AS v, cmn,
               round(CAST(cmn AS DOUBLE) / (du.dg + dv.dg - cmn), 6)
                 AS jaccard
        FROM common
        JOIN deg du ON du.n = pu
        JOIN deg dv ON dv.n = pv
        ORDER BY jaccard DESC, u, v
        LIMIT 20""")),

    // ---- event-time disorder profile: per user, the lateness of each
    // event against the running event-time maximum (in integer micros),
    // rolled up to n_events / n_late / max disorder. max_disorder_us
    // IS the watermark bound: a `withWatermark(max_disorder)` stream
    // would drop none of this user's events. ONE keyed window pass in
    // arrival order (event_id — the harness's ingestion sequence).
    QueryDef(
      "q224_disorder_profile",
      (s, d) => {
        val arrival = Window.partitionBy("user_id").orderBy("event_id")
        t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"))
          .withColumn("run_max",
            max("ts_us").over(
              arrival.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("late_us", col("run_max") - col("ts_us"))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
            max("late_us").as("max_disorder_us"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
          FROM events),
        lateness AS (
          SELECT user_id,
                 max(ts_us) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - ts_us AS late_us
          FROM ev)
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_late,
               max(late_us) AS max_disorder_us
        FROM lateness GROUP BY user_id""")),
  )
}
