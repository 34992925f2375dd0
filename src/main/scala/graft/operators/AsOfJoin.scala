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
  * recent right-side value forward with `last(_, ignoreNulls=true)` over
  * an ordered window per key. Cost is one shuffle + sort on
  * (keys, time) — same as a sort-merge join — and it scales to any data
  * size as long as the keys partition the stream (no global
  * single-partition window).
  *
  * Semantics: for each left row, attach `rightValueCol` from the right
  * row with the greatest `rightTime <= leftTime` and equal keys
  * (left outer: unmatched left rows keep null). Ties on time resolve to
  * the right row (right rows sort before left rows at the same instant),
  * matching ASOF JOIN's `>=` convention; duplicate right rows at the same
  * (key, time) resolve to the greatest `rightTieBreak` — pass a unique
  * column to make the join deterministic. `left` must not already contain
  * a column named `rightValueCol`.
  */
object AsOfJoin {
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValueCol: String,
      rightTieBreak: String): DataFrame = {
    require(!left.columns.contains(rightValueCol),
      s"left side already has column $rightValueCol")
    val rTagged = right
      .select((keys.map(col) :+ col(rightTime).as("__t") :+
        col(rightValueCol).as("__rv") :+ col(rightTieBreak).as("__tie")): _*)
      .withColumn("__side", lit(0))
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(rightValueCol, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col) :+ col(rightValueCol)): _*)
  }
}
