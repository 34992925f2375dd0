package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fact-fact interval join without a nested loop: vanilla Spark plans a
  * pure range predicate (no equi-key) as BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) and a broadcast of a whole fact table. This
  * operator decomposes point-in-interval containment into an EQUI-join
  * on fixed-width buckets:
  *
  *   - every point lands in exactly one bucket (floor(t / w));
  *   - every interval replicates into the buckets it spans
  *     (ceil(len / w) + 1 rows, ~2 for intervals shorter than w);
  *   - the equi-join on bucket + a residual range filter gives exactly
  *     the containment pairs, each exactly once (a pair can only meet
  *     in the point's bucket).
  *
  * Cost: one shuffle on the bucket key, fan-out bounded by
  * interval-length/width — the shape that survives two 100 TB fact
  * tables. Pick `bucketWidth` ≈ typical interval length.
  */
object RangeJoin {

  /** Pairs (point, interval) with loCol <= ptCol < hiCol; all three are
    * long-valued columns (e.g. epoch micros).
    */
  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket", expr(s"$ptCol div $bucketWidth"))
    val ib = intervals.withColumn("__bucket",
      explode(expr(s"sequence($loCol div $bucketWidth, ($hiCol - 1) div $bucketWidth)")))
    pb.join(ib, "__bucket")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bucket")
  }
}
