package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Num

/** Generic column-profiling report (the reference's console "report"
  * stage — row counts, null matrix, distincts — generalized to any
  * frame): one wide aggregation pass over the input produces per-column
  * (non-null count, null count, exact distinct, min, max, mean), then a
  * per-row explode reshapes wide → long. Single scan, single shuffle-
  * free final stage; the exact-distinct aggregates are the only
  * expansion (swap for approx_count_distinct at 100 TB if exactness is
  * negotiable).
  */
object DataProfile {

  /** Profile numeric columns into long format:
    * (col_name, n_nonnull, n_null, n_distinct, min_value, max_value,
    * mean_value).
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__n_$c"),
      sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
      countDistinct(col(c)).as(s"__dist_$c"),
      min(col(c)).cast("double").as(s"__min_$c"),
      max(col(c)).cast("double").as(s"__max_$c"),
      (Num.dsum(col(c).cast("double")) / count(col(c))).as(s"__mean_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"__n_$c").as("n_nonnull"),
      col(s"__nulls_$c").as("n_null"),
      col(s"__dist_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value"),
      round(col(s"__mean_$c"), 6).as("mean_value")))
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
