package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global row numbers / NTILE without a global window.
  *
  * `row_number() OVER (ORDER BY ...)` (and `ntile`) with no PARTITION BY
  * funnels EVERY row through ONE task — fine on a 15k-row dictionary,
  * a single-partition wall on a dimension that is billions of rows at
  * 100 TB. This is the classic two-phase rank:
  *
  *   1. range-partition on the sort key (each partition holds a
  *      contiguous key range; partition i's keys all precede
  *      partition i+1's),
  *   2. sort WITHIN partitions (partition-parallel, no global sort),
  *   3. number rows with `monotonically_increasing_id` —
  *      `partitionId << 33 | local row index`, the zipWithIndex
  *      discipline without leaving Dataset-land,
  *   4. collect the per-partition row COUNTS (≤ shuffle-partition-count
  *      rows — bounded, never data-sized), prefix-sum them into
  *      offsets, and broadcast-join the tiny offset table back:
  *      global rank = local index + partition offset + 1.
  *
  * Every stage is partition-parallel; nothing data-sized ever meets a
  * single task. `order` must be a TOTAL order (include a unique
  * tiebreak column) — the same determinism contract a global
  * row_number carries. The range exchange + partition-local sort are
  * pinned with an eager localCheckpoint so the offset-count job and
  * the final pass see identical partitions and row orders.
  */
object ScalableRank {
  private val LocalIdxMask = (1L << 33) - 1 // monotonically_increasing_id layout

  /** `df` plus `outCol` = exact 1-based global row number under `order`. */
  def withRowNumber(df: DataFrame, order: Seq[Column], outCol: String): DataFrame =
    numbered(df, order, outCol)._1

  /** `df` plus `outCol` = SQL-standard NTILE(buckets) under `order`
    * (first n%buckets buckets hold one extra row), IntegerType like the
    * built-in ntile. Total row count comes free from the offset table —
    * no extra pass.
    */
  def withNtile(df: DataFrame, buckets: Int, order: Seq[Column], outCol: String): DataFrame = {
    require(buckets >= 1, s"withNtile: buckets must be >= 1, got $buckets")
    val (ranked, n) = numbered(df, order, "__sr_rank")
    val q = n / buckets
    val r = n % buckets
    val cut = r * (q + 1) // ranks 1..cut land in the r padded buckets
    ranked
      .withColumn(outCol, expr(
        s"""CAST(CASE WHEN __sr_rank <= ${cut}L
            THEN (__sr_rank - 1) div ${q + 1}L + 1
            ELSE ${r}L + (__sr_rank - ${cut}L - 1) div ${math.max(q, 1L)}L + 1
            END AS INT)"""))
      .drop("__sr_rank")
  }

  /** `df` plus `cumCol` = exact inclusive running SUM of `value` under
    * `order` — and optionally `rankCol` = the 1-based global row number,
    * and/or `suffixMin` = (expr, outCol) the exact INCLUSIVE global
    * suffix-minimum of `expr` under the same order (the smallest
    * non-null `expr` at-or-after each row — "next event value" when
    * `expr` is null on non-event rows) — without a global window.
    * Same two-phase shape as `numbered`, with the per-partition offset
    * table carrying (row count, value sum, suffix min) prefix/suffix
    * entries; the only windows are PARTITIONED by the range partition
    * id, so nothing data-sized meets one task, and the suffix-min adds
    * NO extra pass (it rides the same bounded per-partition collect —
    * a row's global suffix-min is least(its partition-local suffix-min,
    * the min over all LATER partitions)). `value` must be integral
    * (BIGINT arithmetic end to end — the exactness that keeps the
    * result bit-identical to the global-window form) and non-null;
    * `suffixMin._1` is cast to BIGINT and MAY be null (null rows are
    * skipped, the IGNORE NULLS contract); `order` must be a total
    * order.
    */
  def withPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
      cumCol: String, rankCol: Option[String] = None,
      suffixMin: Option[(Column, String)] = None): DataFrame = {
    val spark = df.sparkSession
    val sorted = graft.Iterate.ckpt(
      df.repartitionByRange(order: _*).sortWithinPartitions(order: _*))
    val ids = sorted
      .withColumn("__sr_val", value.cast("long"))
      .withColumn("__sr_sfx",
        suffixMin.map(_._1.cast("long")).getOrElse(lit(null).cast("long")))
      .withColumn("__sr_mid", monotonically_increasing_id())
      .withColumn("__sr_pid", expr("shiftright(__sr_mid, 33)"))
    // bounded collect: one (pid, rows, sum, sfxmin) row per shuffle partition
    val parts = ids.groupBy("__sr_pid")
      .agg(count(lit(1)).as("c"), sum("__sr_val").as("s"),
        min("__sr_sfx").as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .sortBy(_._1)
    val rowOff = parts.map(_._2).scanLeft(0L)(_ + _).init
    val sumOff = parts.map(_._3).scanLeft(0L)(_ + _).init
    // min over all STRICTLY LATER partitions (exclusive scanRight)
    val sfxAfter: Seq[Option[Long]] = parts.map(_._4)
      .scanRight(Option.empty[Long]) { (m, acc) =>
        (m.toSeq ++ acc.toSeq) match {
          case Nil => None
          case xs => Some(xs.min)
        }
      }.tail
    import spark.implicits._
    val offDf = parts.indices
      .map(i => (parts(i)._1, rowOff(i), sumOff(i), sfxAfter(i)))
      .toDF("__sr_pid", "__sr_roff", "__sr_soff", "__sr_safter")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__sr_pid").orderBy("__sr_mid")
      .rowsBetween(Long.MinValue, 0)
    val withCum = ids
      .join(broadcast(offDf), Seq("__sr_pid"))
      .withColumn(cumCol, sum("__sr_val").over(w) + col("__sr_soff"))
    val withRank = rankCol.fold(withCum)(rc => withCum.withColumn(rc,
      col("__sr_mid").bitwiseAND(lit(LocalIdxMask)) + col("__sr_roff") + 1L))
    val out = suffixMin.fold(withRank) { case (_, name) =>
      // suffix-min as a RUNNING prefix-min over the reversed order:
      // a (currentRow, unboundedFollowing) frame looks equivalent but
      // Spark's UnboundedFollowing frame re-scans the tail per row —
      // O(rows²) per partition (measured: 66 s where this form takes
      // 1.4 s); the descending running frame is the O(rows) form
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy("__sr_pid").orderBy(col("__sr_mid").desc)
        .rowsBetween(Long.MinValue, 0)
      // least() skips nulls: local tail-min when present, else the
      // later-partitions min; null only when nothing follows at all
      withRank.withColumn(name,
        least(min(col("__sr_sfx")).over(wd), col("__sr_safter")))
    }
    out.select(
      (df.columns.map(col) ++
        (rankCol.toSeq ++ Seq(cumCol) ++ suffixMin.map(_._2).toSeq).map(col))
        .toIndexedSeq: _*)
  }

  private def numbered(df: DataFrame, order: Seq[Column], outCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    // ckpt AFTER the partition-local sort: both downstream jobs (offset
    // counts, final numbering) then recompute only the id projection
    // over frozen partitions, so the ids are stable across actions.
    val sorted = graft.Iterate.ckpt(
      df.repartitionByRange(order: _*).sortWithinPartitions(order: _*))
    val ids = sorted
      .withColumn("__sr_mid", monotonically_increasing_id())
      .withColumn("__sr_pid", expr("shiftright(__sr_mid, 33)"))
    // bounded collect: one (pid, count) row per shuffle partition
    val counts = ids.groupBy("__sr_pid").agg(count(lit(1)).as("c"))
      .collect()
      .map(row => (row.getLong(0), row.getLong(1)))
      .sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _).init)
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__sr_pid", "__sr_off")
    val out = ids
      .join(broadcast(offDf), Seq("__sr_pid"))
      .withColumn(outCol,
        (col("__sr_mid").bitwiseAND(lit(LocalIdxMask))) + col("__sr_off") + 1L)
      .drop("__sr_pid", "__sr_mid", "__sr_off")
    (out.select((df.columns.map(col) :+ col(outCol)).toIndexedSeq: _*), n)
  }
}
