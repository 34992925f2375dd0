package graft

import graft.operators.ZOrderLayout

/** The scale-dispatched layout scorer (round-10 verdict item 7): both
  * branches forced via the exactLimit knob, the dispatch verdicts must
  * agree, and the sketch slab contract must hold on harness data.
  */
class ZOrderLayoutSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def keyedFrame =
    ZOrderLayout.keyed(Tables(spark, dir, "lineitem"), "l_partkey", "l_suppkey")

  test("score: exact branch at-or-below the limit, sketch above; same verdict") {
    val k = keyedFrame
    val exact = ZOrderLayout.score(k, exactLimit = Long.MaxValue).collect()
    assert(exact.length === 2)
    assert(exact.forall(_.getAs[String]("mode") == "exact"), exact.mkString(";"))
    val sketch = ZOrderLayout.score(k, exactLimit = 0L).collect()
    assert(sketch.length === 2)
    assert(sketch.forall(_.getAs[String]("mode") == "sketch"), sketch.mkString(";"))
    // the layout DECISION must not depend on the branch taken
    val eWins = exact.map(r =>
      r.getAs[String]("layout") -> r.getAs[Boolean]("zorder_wins")).toMap
    val sWins = sketch.map(r =>
      r.getAs[String]("layout") -> r.getAs[Boolean]("zorder_wins")).toMap
    assert(eWins === sWins)
  }

  test("score: the default limit comes from spark.graft.layout.exactLimit") {
    val k = keyedFrame
    spark.conf.set("spark.graft.layout.exactLimit", "0")
    try assert(ZOrderLayout.score(k).collect()
      .forall(_.getAs[String]("mode") == "sketch"))
    finally spark.conf.unset("spark.graft.layout.exactLimit")
    // unset → 10M default → harness row count takes the exact branch
    assert(ZOrderLayout.score(k).collect()
      .forall(_.getAs[String]("mode") == "exact"))
  }

  test("sketch slab-population contract holds across ALL 64 slabs") {
    val rows = ZOrderLayout.scoreSketch(keyedFrame).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Boolean]("slabs_ok")), rows.mkString(";"))
  }

  test("histPercentiles replays Spark's percentile+round bit-for-bit") {
    // skewed deterministic (value, freq) histogram: values cluster via
    // a quadratic residue walk, frequencies power-law-ish — exercises
    // tie ranks, interpolated ranks, and exact-hit ranks (lower==higher)
    import org.apache.spark.sql.functions._
    val pairs = (0 until 500).map { i =>
      val v = (i.toLong * i * 2654435761L) % 4096L
      val c = 1L + (i.toLong * 40503L) % 97L
      (v, c)
    }.toArray
    // duplicate values must merge identically on both sides
    val ps = (1 to 63).map(_ / 64.0) ++ Seq(0.0, 1.0, 0.5)
    val psArr = ps.mkString(", ")
    import spark.implicits._
    val live = pairs.toSeq.toDF("v", "c")
      .agg(expr(s"transform(percentile(v, array($psArr), c), q -> round(q, 6))"))
      .head().getSeq[Double](0)
    val merged = pairs.groupBy(_._1).map { case (v, g) => (v, g.map(_._2).sum) }.toArray
    val replay = ZOrderLayout.histPercentiles(merged, ps.toArray)
    assert(live.toSeq === replay.toSeq)
    // single-row histogram: every percentile is the value itself
    assert(ZOrderLayout.histPercentiles(Array((7L, 3L)), Array(0.0, 0.33, 1.0))
      .toSeq === Seq(7.0, 7.0, 7.0))
  }

  test("histPercentiles property: random histograms match the live agg") {
    // 8 seeded-random histograms (sizes 1..200, freq 1..1000, values
    // with forced ties) checked against percentile(v, ps, c) in ONE
    // grouped pass — the PropertySpecs seeded-loop discipline.
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(4242)
    val cases = (0 until 8).map { cid =>
      val sz = 1 + rnd.nextInt(200)
      cid -> Array.fill(sz)(
        (rnd.nextInt(50).toLong * 7L, 1L + rnd.nextInt(1000).toLong))
    }
    val ps = Seq(0.0, 0.125, 1.0 / 3, 0.5, 0.75, 63.0 / 64, 1.0)
    val psArr = ps.mkString(", ")
    import spark.implicits._
    val live = cases.flatMap { case (cid, pairs) =>
      pairs.map(p => (cid, p._1, p._2))
    }.toDF("cid", "v", "c")
      .groupBy("cid")
      .agg(expr(s"transform(percentile(v, array($psArr), c), q -> round(q, 6))")
        .as("qs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    cases.foreach { case (cid, pairs) =>
      val merged = pairs.groupBy(_._1).map { case (v, g) => (v, g.map(_._2).sum) }.toArray
      val replay = ZOrderLayout.histPercentiles(merged, ps.toArray)
      assert(live(cid).toSeq === replay.toSeq, s"case $cid diverged")
    }
  }

  test("scoreExact fails with a named error on an empty keyed frame") {
    val empty = keyedFrame.filter(org.apache.spark.sql.functions.lit(false))
    val e = intercept[IllegalArgumentException](ZOrderLayout.scoreExact(empty))
    assert(e.getMessage.contains("empty keyed frame"))
  }
}
