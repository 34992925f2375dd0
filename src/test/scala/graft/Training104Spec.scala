package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Invariants for the hundred-fourth wave:
  *
  *  - q472: JVM leaderboard recount per day (count desc, user asc);
  *    ranks are 1..3 and counts non-increasing within a day.
  *  - q473: the IN-list rewrite FIRES (LeftSemi + LocalTableScan in the
  *    physical plan, giant In predicate gone), a 5-element list stays a
  *    plain filter (threshold guard), and toggling the conf off
  *    restores the filter shape — all three plan states pinned.
  *  - q474: JVM equalization replay from the decoded histogram; the
  *    remap is monotone and lands in [0, 255]; a flat (single-gray)
  *    image maps to all zeros by the guard.
  */
class Training104Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q472: JVM leaderboard recount; rank laws") {
    val counts = Tables(spark, dir, "events")
      .selectExpr("CAST(to_date(ts) AS STRING) AS day", "user_id")
      .groupBy("day", "user_id").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = counts.groupBy(_._1).toSeq.flatMap { case (day, xs) =>
      xs.sortBy { case (_, u, c) => (-c, u) }.take(3).zipWithIndex
        .map { case ((_, u, c), i) => (day, i + 1L, u, c) }
    }.sortBy(x => (x._1, x._2))
    val got = q("q472_stream_topk_state").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
    got.groupBy(_._1).values.foreach { xs =>
      val sorted = xs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 <= a._4, "counts non-increasing")
        case _ =>
      }
    }
  }

  test("q473: rewrite fires over threshold, holds under it, obeys the conf") {
    val df = q("q473_inlist_join_rule")
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LocalTableScan"), plan)
    assert(!plan.contains(" IN ("), plan)

    // threshold guard: a small list stays a filter
    val small = spark.read.parquet(s"$dir/lineitem.parquet")
      .where("l_partkey IN (1, 2, 3, 4, 5)")
    val smallPlan = small.queryExecution.optimizedPlan.toString
    assert(!smallPlan.contains("LeftSemi"), smallPlan)

    // conf off: the big list stays a filter too
    spark.conf.set(graft.plans.InListToJoinRewrite.flag, "false")
    try {
      val off = q("q473_inlist_join_rule")
      val offPlan = off.queryExecution.optimizedPlan.toString
      assert(!offPlan.contains("LeftSemi"), offPlan)
    } finally spark.conf.unset(graft.plans.InListToJoinRewrite.flag)
  }

  test("q474: JVM equalization replay; monotone bounded remap; flat guard") {
    import graft.operators.BmpCodec
    val ids = Tables(spark, dir, "documents").select("doc_id")
      .collect().map(_.getLong(0))
    def img(id: Long): Array[Byte] = {
      val did = id % 1000000L
      BmpCodec.encode24((1L + id % 7L).toInt, (1L + id % 5L).toInt, (x, y) => (
        ((did + 3L * x + 7L * y) % 256L).toInt,
        ((2L * did + 5L * x + y) % 256L).toInt,
        ((3L * did + x + 11L * y) % 256L).toInt))
    }
    val want = ids.sorted.map { id =>
      val (w, h, hist) = BmpCodec.decode24Histogram(img(id))
      val n = w.toLong * h
      val cdf = hist.scanLeft(0L)(_ + _).drop(1)
      val gMin = hist.indexWhere(_ > 0)
      val gMax = hist.lastIndexWhere(_ > 0)
      val cdfMin = cdf(gMin)
      def eq(g: Int): Long =
        if (n == cdfMin) 0L else (cdf(g) - cdfMin) * 255L / (n - cdfMin)
      // remap laws, checked on every populated gray level
      var prev = -1L
      (0 until 256).filter(hist(_) > 0).foreach { g =>
        val e = eq(g)
        assert(e >= 0L && e <= 255L, s"eq($g) out of range for doc $id")
        assert(e >= prev, s"remap not monotone at $g for doc $id")
        prev = e
      }
      if (gMin == gMax) assert(eq(gMax) === 0L, "flat image maps to zero")
      val sa = (0 until 256).map(g => hist(g) * eq(g)).sum
      val sq = (0 until 256).map(g => hist(g) * eq(g) * eq(g)).sum
      (id, n, gMin.toLong, gMax.toLong, sa, sq)
    }
    val got = q("q474_bmp_equalize").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === want.toSeq)
  }
}
