package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The early-exit fixpoint (round-10 verdict item 6) must be INVISIBLE:
  * identical output to the blind fixed-round replay, strictly fewer
  * rounds once converged — proven on a planted chain (where the exact
  * convergence round is known a priori) and on the two declared
  * iterative queries (q458 PERT, q307 BFS) at sf0.001.
  */
class FixpointSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("planted chain: early exit at depth+1 rounds, output equals blind replay") {
    // chain 1→2→…→6, min-hop relaxation from node 1: node i settles at
    // round i-1, so the frame is converged after round 5 and the exit
    // fires on round 6's no-change probe; the blind replay runs all 20
    val edges = (1 to 5).map(i => (i, i + 1)).toDF("src", "dst")
      .localCheckpoint(true)
    val init = (1 to 6).map(i => (i, if (i == 1) 0L else -1L)).toDF("node", "d")
    def step(cur: DataFrame): DataFrame = {
      val nxt = edges
        .join(cur.filter(col("d") >= 0).withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg((min("d") + 1).as("nd"))
      cur.join(nxt, Seq("node"), "left")
        .select(col("node"),
          greatest(col("d"), coalesce(col("nd"), lit(-1L))).as("d"))
    }
    val (fast, fastRounds) =
      Iterate.fixpoint(init, 20, Seq("node"), Seq("d"))(step)
    val (blind, blindRounds) =
      Iterate.fixpoint(init, 20, Seq("node"), Seq("d"), earlyExit = false)(step)
    assert(fastRounds === 6 && blindRounds === 20)
    val got = fast.orderBy("node").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq === (1 to 6).map(i => (i, (i - 1).toLong)))
    assert(blind.orderBy("node").collect().map(r => (r.getInt(0), r.getLong(1)))
      .toSeq === got.toSeq)
  }

  test("a growing key set is a change even when matched rows are identical") {
    // frontier-only shape: each round ADDS one key and touches nothing
    // else — an inner-join probe would see zero changed matches after
    // round 1 and truncate the frontier; the full-outer presence probe
    // must keep running to the cap
    val (res, rounds) = Iterate.fixpoint(
      Seq((1, 0L)).toDF("k", "v"), 5, Seq("k"), Seq("v")) { c =>
      val mx = c.agg(max("k")).head().getInt(0)
      c.unionByName(Seq((mx + 1, 0L)).toDF("k", "v"))
    }
    assert(rounds === 5, s"growing frontier early-exited at round $rounds")
    assert(res.count() === 6L)
  }

  test("a shrinking key set is a change even when surviving rows are identical") {
    val init = (1 to 6).map(i => (i, 0L)).toDF("k", "v")
    val (res, rounds) = Iterate.fixpoint(
      init, 5, Seq("k"), Seq("v")) { c =>
      val mx = c.agg(max("k")).head().getInt(0)
      c.filter(col("k") =!= mx) // drop one key per round, values untouched
    }
    assert(rounds === 5, s"shrinking key set early-exited at round $rounds")
    assert(res.count() === 1L)
  }

  test("a never-converging step runs exactly maxRounds") {
    val (res, rounds) = Iterate.fixpoint(
      Seq((1, 0L)).toDF("k", "v"), 7, Seq("k"), Seq("v")) { c =>
      c.select(col("k"), (col("v") + 1).as("v"))
    }
    assert(rounds === 7)
    assert(res.head().getLong(1) === 7L)
  }

  test("q458: both PERT passes exit early at sf0.001; output equals the blind replay") {
    val (outFast, fwd, bwd) = queries.Training98.pertPasses(spark, dir)
    val fastRows = outFast.collect().map(_.toSeq).toSeq
    val (outBlind, fwdB, bwdB) =
      queries.Training98.pertPasses(spark, dir, earlyExit = false)
    assert(fwdB === 12 && bwdB === 12)
    // DAG depth is ~log4(part count) ≈ 5 at sf0.001 — well under the cap
    assert(fwd < 12, s"forward pass did not converge early: $fwd rounds")
    assert(bwd < 12, s"backward pass did not converge early: $bwd rounds")
    assert(outBlind.collect().map(_.toSeq).toSeq === fastRows)
  }

  test("q458: delta-frontier rounds equal the full-frame dispatch default") {
    // sf0.001 routes full-frame (2000 tasks < 65536); forcing the
    // limit to 0 routes every round through the delta-frontier form —
    // both must produce the identical critical path (verdict-agreement
    // across the pertPasses dispatch)
    val (outDefault, _, _) = queries.Training98.pertPasses(spark, dir)
    val defaultRows = outDefault.collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.pert.deltaTaskLimit", "0")
    try {
      val (outDelta, fwd, bwd) = queries.Training98.pertPasses(spark, dir)
      assert(fwd < 12 && bwd < 12, s"delta passes did not exit early: $fwd/$bwd")
      assert(outDelta.collect().map(_.toSeq).toSeq === defaultRows)
    } finally spark.conf.unset("spark.graft.pert.deltaTaskLimit")
  }

  test("q307: BFS exits as soon as a round improves nothing; output equals blind replay") {
    val (outFast, rounds, sizes) = queries.Training45.bfsDistance(spark, dir)
    val fastRows = outFast.collect().map(_.toSeq).toSeq
    val (outBlind, roundsB, _) =
      queries.Training45.bfsDistance(spark, dir, earlyExit = false)
    assert(roundsB === 4)
    assert(rounds <= 4)
    // delta-frontier shape: each node settles exactly once, so the
    // per-round frontiers are disjoint and their total is bounded by
    // the node count — the old all-settled-nodes form re-expanded
    // every settled node every round
    val nNodes = queries.Training45.bfsDistance(spark, dir)._1
      .agg(org.apache.spark.sql.functions.sum("n_nodes")).head().getLong(0)
    assert(sizes.sum <= nNodes, s"frontiers re-expanded settled nodes: $sizes")
    assert(outBlind.collect().map(_.toSeq).toSeq === fastRows)
  }
}
