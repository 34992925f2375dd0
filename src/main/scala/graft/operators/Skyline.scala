package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier) over integer dimensions:
  * keep the points maximizing `maxCol` while minimizing `minCol` that
  * no other point dominates.
  *
  * Algorithm is the classic two-phase scheme: a LOCAL skyline per
  * partition (sorted scan — removes every point dominated by a
  * same-partition point, never a globally non-dominated one), then a
  * GLOBAL verify of the surviving candidates with a broadcast
  * anti-join on the dominance predicate. Local pruning collapses any
  * realistically correlated input to a candidate set near the true
  * frontier size, which is what makes the broadcast NLJ on the merge
  * step safe at scale; the data-sized pass is one sort-within-
  * partitions + linear scan, no shuffle.
  *
  * Equal points (both dims tie) do not strictly dominate each other
  * and all survive — same semantics as the NOT EXISTS SQL formulation.
  */
object Skyline {

  final case class SkyPoint(id: Long, x: Long, y: Long)

  /** Skyline of (idCol, maxCol↑ better, minCol↓ better); all three
    * columns must be integral (the engine's exact-arithmetic
    * discipline — scale floats to cents/micros upstream).
    */
  def skyline2D(
      points: DataFrame, idCol: String, maxCol: String, minCol: String): DataFrame = {
    val ss = points.sparkSession
    import ss.implicits._
    val typed = points.select(
      col(idCol).cast("long").as("id"),
      col(maxCol).cast("long").as("x"),
      col(minCol).cast("long").as("y")).as[SkyPoint]

    val pruned = typed
      .sortWithinPartitions($"x".desc, $"y".asc)
      .mapPartitions { it =>
        // minYHigher: min y among rows with x STRICTLY greater than the
        // current run's x. curRunMinY: min y within the current equal-x
        // run (strictly smaller y in the same run dominates; equal y
        // ties survive).
        var minYHigher = Long.MaxValue
        var curX = Long.MinValue
        var curRunMinY = Long.MaxValue
        var started = false
        val out = scala.collection.mutable.ArrayBuffer.empty[SkyPoint]
        it.foreach { pt =>
          if (!started || pt.x != curX) {
            minYHigher = math.min(minYHigher, curRunMinY)
            curX = pt.x
            curRunMinY = Long.MaxValue
            started = true
          }
          if (!(minYHigher <= pt.y || curRunMinY < pt.y)) out += pt
          curRunMinY = math.min(curRunMinY, pt.y)
        }
        out.iterator
      }

    // the candidate set is frontier-sized; localCheckpoint materializes
    // it ONCE so the self-join's two arms don't each recompute the
    // agg+prune pipeline (object-typed branches don't hit ReuseExchange)
    val c = pruned.toDF("id", "x", "y").localCheckpoint()
    c.as("a")
      .join(broadcast(c.as("b")),
        col("b.x") >= col("a.x") && col("b.y") <= col("a.y") &&
          (col("b.x") > col("a.x") || col("b.y") < col("a.y")),
        "left_anti")
      .select(col("id").as(idCol), col("x").as(maxCol), col("y").as(minCol))
  }
}
