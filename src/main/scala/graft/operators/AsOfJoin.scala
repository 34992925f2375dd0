package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (most-recent-match join), Spark-first.
  *
  * Spark has no ASOF JOIN operator; the naive encoding is an inequality
  * join + per-row max, which Catalyst plans as a broadcast-nested-loop —
  * O(n·m) and hopeless at scale. This instead uses the union + windowed
  * last-value pattern: tag both sides, union them, and carry the most
  * recent right-side values forward with `last(_, ignoreNulls=true)` over
  * an ordered window per key. Cost is one shuffle + sort on
  * (keys, time) — same as a sort-merge join — and it scales to any data
  * size as long as the keys partition the stream (no global
  * single-partition window).
  *
  * Semantics: for each left row, attach `rightValueCols` from the right
  * row with the greatest `rightTime <= leftTime` and equal keys
  * (left outer: unmatched left rows keep nulls). Ties on time resolve to
  * the right row (right rows sort before left rows at the same instant),
  * matching ASOF JOIN's `>=` convention; duplicate right rows at the same
  * (key, time) resolve to the greatest `rightTieBreak` — pass a unique
  * column to make the join deterministic. `left` must not already contain
  * any of `rightValueCols`.
  */
object AsOfJoin {
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      rightTieBreak: String): DataFrame = {
    require(rightValueCols.forall(!left.columns.contains(_)),
      s"left side already has one of ${rightValueCols.mkString(",")}")
    val rvAliased = rightValueCols.map(c => col(c).as(s"__rv_$c"))
    val rTagged = right
      .select((keys.map(col) :+ col(rightTime).as("__t") :+
        col(rightTieBreak).as("__tie")) ++ rvAliased: _*)
      .withColumn("__side", lit(1))
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(2)) // left sorts after right at equal time
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct fold, not one last() per column: per-column folds with
    // ignoreNulls are independent, so a null field in the most recent
    // right row would resurrect a STALE value from an older right row —
    // stitching fields of different rows together. The struct is non-null
    // exactly for right rows (null for left), so last(_, ignoreNulls)
    // carries the most recent right ROW as a unit; a null field stays
    // null, true as-of semantics. Also one window expression instead of N.
    val packed = when(col("__side") === 1,
      struct(rightValueCols.map(c => col(s"__rv_$c").as(c)): _*))
    unioned
      .withColumn("__rv_row", last(packed, ignoreNulls = true).over(w))
      .filter(col("__side") === 2)
      .select((left.columns.map(col) ++
        rightValueCols.map(c => col(s"__rv_row.$c").as(c))).toIndexedSeq: _*)
  }
}
