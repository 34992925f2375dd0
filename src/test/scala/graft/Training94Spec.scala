package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninety-fourth wave:
  *
  *  - q444: JVM replay of the HRU greedy (view sizes recounted from
  *    the raw join, benefits recomputed per step); benefits are
  *    non-increasing across steps and every pick is a real view;
  *  - q445: JVM replay of the gap-clipped footprint; the curve is
  *    monotone non-decreasing in τ and bounded by the distinct-user
  *    count;
  *  - q446: JVM replay of all pair censuses; the pair categories
  *    partition n(n−1)/2 exactly.
  */
class Training94Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q444: JVM HRU greedy replay; benefits non-increasing") {
    val base = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"),
        expr("c.c_custkey = o.o_custkey"))
      .selectExpr("CAST(c.c_nationkey AS BIGINT)", "c.c_mktsegment",
        "o.o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def viewRows(mask: Int): Long = {
      if (mask == 0) 1L
      else base.map { case (n, s, p) =>
        ((if ((mask & 1) != 0) n else -1L),
          (if ((mask & 2) != 0) s else ""),
          (if ((mask & 4) != 0) p else ""))
      }.distinct.length.toLong
    }
    val rows = (0 to 7).map(m => m -> viewRows(m)).toMap
    var mat = Set(7)
    val picks = (1 to 3).map { step =>
      def cost(w: Int): Long =
        mat.filter(v => (w & v) == w).map(rows).min
      val cand = (0 to 7).filterNot(mat)
      val best = cand.map { v =>
        val ben = (0 to 7).filter(w => (w & v) == w)
          .map(w => math.max(0L, cost(w) - rows(v))).sum
        (v, rows(v), ben)
      }.sortBy { case (v, _, b) => (-b, v) }.head
      mat += best._1
      (step, best._1, best._2, best._3)
    }
    val got = q("q444_view_selection_greedy").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === picks)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._4, "greedy benefit must not increase")
    }
  }

  test("q445: JVM footprint replay; curve monotone and bounded") {
    val tr = Tables(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts)", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val h0 = tr.map(_._2).min; val h1 = tr.map(_._2).max
    val want = Seq(600L, 3600L, 21600L, 86400L).map { tau =>
      val presence = tr.groupBy(_._1).values.map { xs =>
        val ts = xs.sortBy(x => (x._2, x._3)).map(_._2)
        ts.zip(ts.drop(1) :+ h1)
          .map { case (a, b) => math.min(b - a, tau * 1000000L) }.sum
      }.sum
      (tau.toInt, presence, presence / ((h1 - h0) / 1000000L))
    }
    val got = q("q445_working_set_footprint").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3, "footprint grows with the window")
    }
    val users = tr.map(_._1).distinct.length.toLong
    assert(got.last._3 <= users * 1000000L,
      "working set cannot exceed the distinct-user count")
  }

  test("q446: JVM pair replay; categories partition all pairs") {
    val daily = Tables(spark, dir, "orders")
      .groupBy("o_orderdate")
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = daily.length.toLong
    var (c, dd, tx, ty, txy) = (0L, 0L, 0L, 0L, 0L)
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val ((x1, y1), (x2, y2)) = (daily(i), daily(j))
      val prod = (x1 - x2) * (y1 - y2)
      if (x1 == x2 && y1 == y2) txy += 1
      else if (x1 == x2) tx += 1
      else if (y1 == y2) ty += 1
      else if (prod > 0) c += 1
      else dd += 1
    }
    val n0 = n * (n - 1) / 2
    val tau = if (c >= dd) (c - dd) * 1000000L / n0 else -((dd - c) * 1000000L / n0)
    val r = q("q446_kendall_tau").collect().head
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === c)
    assert(r.getLong(2) === dd)
    assert(r.getLong(3) === tx)
    assert(r.getLong(4) === ty)
    assert(r.getLong(5) === txy)
    assert(r.getLong(6) === tau)
    assert(c + dd + tx + ty + txy === n0, "categories partition the pairs")
  }
}
