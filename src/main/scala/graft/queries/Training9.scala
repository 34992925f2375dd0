package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Ninth wave: sketch mergeability and integer-exact audit statistics.
  *
  *  - q156 exercises the property that makes sketches THE 100 TB
  *    distinct-count answer: per-partition sketches UNION losslessly.
  *    q32 gates a single global sketch; here daily Datasketches HLL
  *    sketches are merged across days and the merged estimate must
  *    still meet the accuracy contract against the exact witness.
  *  - q157 is the Benford first-digit audit — the classic fraud /
  *    data-quality screen — with the expected log10(1+1/d) masses as
  *    precomputed ppm literals (the q145 discipline: model constants
  *    are inputs, not runtime libm), leading digits extracted from the
  *    cents string so no float log appears anywhere.
  */
object Training9 {
  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- mergeable-HLL contract: daily user sketches per event type,
    // hll_union_agg'd across days, estimate within 3% of the exact
    // distinct witness. The merge tree is exactly how a 1000-executor
    // cluster counts distincts: partial sketches per partition/day, one
    // tiny union at the root — no shuffle of raw ids, bounded memory.
    QueryDef(
      "q156_hll_merge",
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_type"), col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        val daily = ev.groupBy("event_type", "day")
          .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
        val merged = daily.groupBy("event_type")
          .agg(
            expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("__est"),
            count(lit(1)).as("n_days"))
        val exact = ev.groupBy("event_type")
          .agg(countDistinct("user_id").as("n_users_exact"))
        merged.join(exact, "event_type")
          .select(col("event_type"), col("n_users_exact"), col("n_days"),
            (abs(col("__est") - col("n_users_exact")) * lit(100L) <=
              lit(3L) * col("n_users_exact")).as("merged_ok"))
      },
      Some("""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users_exact,
               count(DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS n_days,
               TRUE AS merged_ok
        FROM events GROUP BY 1""")),

    // ---- Benford first-digit audit of l_extendedprice: observed
    // leading-digit counts vs the Benford expectation. Digits come from
    // the cents STRING (positive money, so cents and value share a
    // leading digit) — no log10 at runtime; the expected masses
    // round(log10(1+1/d)·1e6) are literals. obs_ppm uses half-up
    // integer division; dev_ppm = |obs − exp| is the audit signal.
    QueryDef(
      "q157_benford",
      (s, d) => {
        val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
          66947L, 57992L, 51153L, 45757L)
        val expCase = benford.zipWithIndex
          .map { case (ppm, i) => s"WHEN ${i + 1} THEN ${ppm}L" }
          .mkString("CASE digit ", " ", " END")
        // the 9-row digit table is localCheckpointed so the total
        // branch folds it instead of re-running the data-sized agg
        val digits = t(s, d, "lineitem")
          .select(expr("""CAST(substr(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                          AS STRING), 1, 1) AS BIGINT)""").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_obs"))
          .localCheckpoint()
        val tot = digits.agg(sum("n_obs").as("n_total"))
        digits.crossJoin(broadcast(tot))
          .select(col("digit"), col("n_obs"),
            expr("(2 * 1000000 * n_obs + n_total) div (2 * n_total)").as("obs_ppm"),
            expr(expCase).as("exp_ppm"))
          .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
      },
      Some("""
        WITH digits AS (
          SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                      AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM lineitem),
        c AS (SELECT digit, count(*) AS n_obs FROM digits GROUP BY 1),
        t AS (SELECT sum(n_obs) AS n_total FROM c),
        e AS (
          SELECT digit, n_obs,
                 (2 * 1000000 * n_obs + n_total) // (2 * n_total) AS obs_ppm,
                 CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
                            WHEN 3 THEN 124939 WHEN 4 THEN 96910
                            WHEN 5 THEN 79181 WHEN 6 THEN 66947
                            WHEN 7 THEN 57992 WHEN 8 THEN 51153
                            WHEN 9 THEN 45757 END AS exp_ppm
          FROM c, t)
        SELECT digit, n_obs, CAST(obs_ppm AS BIGINT) AS obs_ppm,
               CAST(exp_ppm AS BIGINT) AS exp_ppm,
               CAST(abs(obs_ppm - exp_ppm) AS BIGINT) AS dev_ppm
        FROM e""")),
  )
}
