package graft.operators

import graft.SparkSpec

/** Skyline.skyline2D against a JVM brute-force dominance oracle:
  * random point sets (fixed seeds), duplicate points, collinear
  * frontiers, and partitioning-invariance (the local-prune phase must
  * not depend on how rows land in partitions).
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx >= x && by <= y && (bx > x || by < y)
      }
    }.toSet

  private def run(pts: Seq[(Long, Long, Long)], parts: Int): Set[(Long, Long, Long)] =
    Skyline.skyline2D(
      pts.toDF("id", "x", "y").repartition(parts), "id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("random point sets match the brute-force dominance oracle") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val pts = (0 until 300).map(i =>
        (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      assert(run(pts, 7) === brute(pts), s"seed $seed")
    }
  }

  test("duplicate frontier points all survive (no strict dominance between equals)") {
    val pts = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 4L, 4L), (4L, 11L, 9L))
    // (1) and (2) tie on both dims; (4) has higher x but higher y; (3)
    // has lower y but lower x — frontier is all except none dominated?
    val got = run(pts, 2)
    assert(got === brute(pts))
    assert(got.contains((1L, 10L, 5L)) && got.contains((2L, 10L, 5L)))
  }

  test("result is invariant to the number of partitions") {
    val rnd = new scala.util.Random(42)
    val pts = (0 until 500).map(i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val expected = brute(pts)
    for (parts <- Seq(1, 3, 16)) {
      assert(run(pts, parts) === expected, s"parts $parts")
    }
  }

  test("totally ordered input collapses to the single best point") {
    val pts = (1L to 50L).map(i => (i, i, 100L - i)) // higher x always lower y
    assert(run(pts, 4) === Set((50L, 50L, 50L)))
  }
}
