package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RangeJoin.pointInInterval vs the naive cross-join filter: identical
  * pairs (no misses at bucket boundaries, no duplicates from interval
  * replication), including intervals spanning many buckets and ones
  * shorter than a bucket.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches naive cross join across bucket widths") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "t")
    val intervals = (1 to 80).map { i =>
      val lo = rnd.nextInt(9500).toLong
      (i.toLong, lo, lo + 1 + rnd.nextInt(800)) // lengths 1..800
    }.toDF("iid", "lo", "hi")

    val naive = points.crossJoin(intervals)
      .filter(col("t") >= col("lo") && col("t") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (w <- Seq(1L, 7L, 100L, 1024L, 100000L)) {
      val got = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"width $w produced duplicate pairs")
      assert(got.toSet === naive, s"width $w mismatch")
    }
  }

  test("boundary semantics: inclusive lo, exclusive hi") {
    val points = Seq((1L, 10L), (2L, 19L), (3L, 20L)).toDF("pid", "t")
    val intervals = Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", 5L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }
}
