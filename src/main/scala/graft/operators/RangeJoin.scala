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

  /** Bounded-output production form of [[pointInInterval]] (round-12
    * verdict item 2 — the q132→q141 precedent applied to the interval
    * join): one row PER INTERVAL with the contained-point count and the
    * minimum point offset, instead of the raw pair list.
    *
    * The pair join's cost is quadratic TWICE over: output mass grows
    * with per-bucket density², and even aggregating directly on the
    * bucketed join still ENUMERATES every pair inside the join stage
    * (measured: 4.4× wall at 10× data for the pair form, 3.3× for a
    * join-then-aggregate form — the enumeration survives the
    * aggregation). This operator never forms a pair. Containment
    * counts are RANK ARITHMETIC: with C(x) = #{points < x},
    * n(interval) = C(hi) − C(lo), and the earliest contained point is
    * the smallest point at-or-after lo. Both come from ONE two-phase
    * global pass (ScalableRank.withPrefixSum — range exchange +
    * partition-local sort, nothing data-sized on one task) over the
    * tagged union of points (weight 1) and per-interval lo/hi probes
    * (weight 0, ordered BEFORE equal-valued points so C is the strict
    * count): the running weight-sum at a probe row IS C(x), and the
    * pass's suffix-min option carries the next point value to the lo
    * probe in the same stage. One interval-sized groupBy stitches the
    * two probes back together. Every stage is linear in |points| +
    * |intervals| at any density — the 100 TB shape. Pair-level
    * questions stay on [[pointInInterval]] (also the oracle-truth form
    * the agreement spec replays).
    *
    * `keyCol` must identify intervals uniquely. Output: `keyCol`,
    * `n_points` (0 for intervals nothing hit — every interval
    * survives), `min_lag` (min ptCol − loCol; null when n_points = 0).
    */
  def intervalOverlapStats(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, keyCol: String, loCol: String, hiCol: String): DataFrame = {
    val keyType = intervals.schema(keyCol).dataType
    val pts = points.select(
      col(ptCol).cast("long").as("__t"), lit(1).as("__kind"),
      lit(1L).as("__w"), lit(null).cast(keyType).as(keyCol),
      lit(null).cast("long").as("__lo"), lit(null).cast("int").as("__isLo"))
    // both probes generated from ONE scan of intervals (a per-branch
    // union would re-read the interval source once per bound)
    val probes = intervals
      .select(col(keyCol), col(loCol).cast("long").as("__lo"),
        col(hiCol).cast("long").as("__hi"))
      .select(col(keyCol), col("__lo"),
        explode(expr("array(struct(__lo AS t, 1 AS isLo), struct(__hi AS t, 0 AS isLo))"))
          .as("__p"))
      .select(col("__p.t").as("__t"), lit(0).as("__kind"),
        lit(0L).as("__w"), col(keyCol), col("__lo"),
        col("__p.isLo").as("__isLo"))
    val summed = ScalableRank.withPrefixSum(
      pts.unionByName(probes),
      Seq(col("__t"), col("__kind")), col("__w"), "__c",
      suffixMin = Some((when(col("__kind") === 1, col("__t")), "__nxt")))
    summed.filter(col("__kind") === 0)
      .groupBy(keyCol)
      .agg(
        max(when(col("__isLo") === 1, col("__c"))).as("__clo"),
        max(when(col("__isLo") === 0, col("__c"))).as("__chi"),
        max(col("__lo")).as("__lo"),
        max(when(col("__isLo") === 1, col("__nxt"))).as("__tp"))
      .select(col(keyCol),
        (col("__chi") - col("__clo")).as("n_points"),
        when(col("__chi") > col("__clo"), col("__tp") - col("__lo"))
          .as("min_lag"))
  }
}
