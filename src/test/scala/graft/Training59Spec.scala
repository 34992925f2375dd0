package graft

import org.apache.spark.sql.functions._

/** Invariant for the fifty-ninth wave (q341): the streaming bitmap
  * distinct equals a JVM set recount per day — exactness is the whole
  * claim, so the check is equality, not a bound.
  */
class Training59Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q341: streaming bitmap distinct equals exact per-day sets") {
    val out = q("q341_stream_bitmap_distinct").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    val ev = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    val expect = ev.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.length.toLong).toMap
    assert(out === expect)
  }
}
