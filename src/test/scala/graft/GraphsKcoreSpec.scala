package graft

import graft.operators.Graphs

/** kcoreRounds fixpoint early-exit (the FixpointSpec discipline): a
  * converged peel must stop running joins and emit the remaining
  * fixed-round rows verbatim — proven on planted graphs where the
  * convergence round is known a priori.
  */
class GraphsKcoreSpec extends SparkSpec {
  import spark.implicits._

  test("stable core: exit after one no-op round, tail rows are the fixed point") {
    // triangle, k=2: every node keeps degree 2, round 1 removes nothing
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
      .localCheckpoint(true)
    val (df, executed, _) =
      Graphs.kcoreRoundsCounted(tri, k = 2, rounds = 5,
        edgeLimit = Long.MaxValue)
    val rows = df.collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(executed === 1)
    assert(rows.toSeq === (0 to 5).map(r => (r, 3L, 3L)))
  }

  test("peel-to-empty: converges at the empty graph, remaining rounds filled") {
    // path 1-2-3-4, k=2: ends peel first, then the middle, empty by
    // round 2; round 3 is the no-change probe, rounds 4-6 are fills
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
      .localCheckpoint(true)
    val (df, executed, _) =
      Graphs.kcoreRoundsCounted(chain, k = 2, rounds = 6,
        edgeLimit = Long.MaxValue)
    val rows = df.collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(executed === 3)
    assert(rows.take(2).toSeq === Seq((0, 4L, 3L), (1, 2L, 1L)))
    assert(rows.drop(2).toSeq === (2 to 6).map(r => (r, 0L, 0L)))
  }
}
