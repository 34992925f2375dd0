package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Truly GLOBAL equi-depth binning at scale: percentile boundaries +
  * comparison assignment (the path q83's scaladoc documents; q83 itself
  * is keyed ntile, which is the right tool only when a partition key
  * bounds each window).
  *
  * Shape: boundaries are ONE aggregation producing bins-1 doubles —
  * broadcast-size by construction; assignment is a per-row codegen'd
  * fold over that broadcast array (no sort, no window, no exchange);
  * the per-bin stats are one keyed aggregation over `bins` keys. A
  * global ntile would need a total sort and a single-partition window —
  * the classic 100 TB killer this operator exists to avoid.
  *
  * Exact `percentile` buffers per-partition values, fine to ~memory; at
  * extreme scale swap in approx_percentile — boundaries become
  * approximate but every row is still binned consistently against the
  * same broadcast boundary array, so bins stay a partition of the data.
  *
  * Cross-engine: boundaries are rounded to 6 dp at the source (the q74
  * libm discipline); Spark `percentile` and DuckDB `quantile_cont` use
  * the same linear interpolation. Bin i = 1 + #{boundaries < v}: ties
  * with a boundary go to the lower bin on both engines since both
  * compare against the identical rounded boundary list.
  */
object EquiDepthBins {

  private def ps(bins: Int): Seq[Double] = (1 until bins).map(_.toDouble / bins)

  /** (bin, n, lo, hi, mean_v) for `bins` global equi-depth bins of
    * `valueCol` (nulls excluded). bin ∈ 1..bins.
    */
  def globalBins(df: DataFrame, valueCol: String, bins: Int = 10): DataFrame = {
    require(bins > 1)
    val probs = ps(bins).mkString("array(", ", ", ")")
    val bounds = df
      .agg(expr(
        s"transform(percentile(cast($valueCol as double), $probs), b -> round(b, 6))")
        .as("__bounds"))
    val rows = df
      .filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("v"))
    rows.crossJoin(broadcast(bounds))
      .withColumn("bin", expr(
        "cast(aggregate(__bounds, 0, (acc, b) -> acc + (CASE WHEN v > b THEN 1 ELSE 0 END)) + 1 as bigint)"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        round(min("v"), 6).as("lo"),
        round(max("v"), 6).as("hi"),
        round(graft.Num.dsum(col("v")) / count(lit(1)), 6).as("mean_v"))
  }

  /** Balanced binary-search CASE tree computing, per row, how many of
    * the SORTED boundary literals `bs` lie below the key:
    *
    *  - `strict = true`  → #{j : b_j <  x} (ties with a boundary go to
    *    the lower bucket — the first-match `WHEN x <= b_i` chain form);
    *  - `strict = false` → #{j : b_j <= x} (the `WHEN x < b_i` form).
    *
    * ⌈log₂ n⌉ codegen'd compares per row instead of the linear chain's
    * ~n/2 average — the hot-path form when a two-digit boundary grid is
    * evaluated against a data-sized input (the q294/q318/q344 slab and
    * rank assignments; measured 1.4× on the q294 10× leg). Correct for
    * duplicate boundary values: the tree narrows to the same index the
    * first-match chain would produce.
    */
  def searchCountExpr(keyCol: String, bs: Seq[String], strict: Boolean): String = {
    val op = if (strict) "<=" else "<"
    def t(lo: Int, hi: Int): String =
      if (lo == hi) lo.toString
      else {
        val mid = (lo + hi) / 2
        s"(CASE WHEN $keyCol $op ${bs(mid)} THEN ${t(lo, mid)} ELSE ${t(mid + 1, hi)} END)"
      }
    t(0, bs.length)
  }

  /** DuckDB oracle for globalBins on `table`.`valueCol`, emitted from the
    * same probability list so the two sides can't drift.
    */
  def globalBinsDuck(table: String, valueCol: String, bins: Int = 10): String = {
    val qs = ps(bins)
      .map(p => s"round(quantile_cont(CAST($valueCol AS DOUBLE), $p), 6)")
      .mkString("[", ", ", "]")
    s"""
      WITH b AS (SELECT $qs AS bounds FROM $table),
      binned AS (
        SELECT CAST($valueCol AS DOUBLE) AS v,
               CAST(len(list_filter(b.bounds, x -> CAST($valueCol AS DOUBLE) > x)) + 1 AS BIGINT) AS bin
        FROM $table, b
        WHERE $valueCol IS NOT NULL)
      SELECT bin, count(*) AS n,
             round(min(v), 6) AS lo,
             round(max(v), 6) AS hi,
             round(${graft.Num.dsumSql("v")} / count(*), 6) AS mean_v
      FROM binned GROUP BY bin"""
  }
}
