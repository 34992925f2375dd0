package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninety-first wave:
  *
  *  - q435: the error curve is monotone non-increasing in the bucket
  *    budget; a brute-force enumeration over all split placements at
  *    small k reproduces the DP optimum (independent algebraic form);
  *  - q436: winsorized/trimmed identities recomputed from a full JVM
  *    sort — boundaries, clamp censuses, and the robust-mean ordering
  *    trimmed ≤ winsorized when the tails are asymmetric is NOT
  *    assumed (only the exact identities are);
  *  - q437: a JVM stratified replay reproduces every pair row, and
  *    any flagged paradox row really has a majority of strata
  *    disagreeing with the aggregate sign.
  */
class Training91Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q435: curve monotone; brute-force split enumeration matches DP for k<=3") {
    val got = q("q435_voptimal_histogram").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(got.map(_._1).toSeq === (1 to 8))
    got.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(b <= a, s"error curve must not increase: $a -> $b")
    }
    // independent check: rebuild the grid exactly as the query does,
    // then enumerate all 1- and 2-split histograms
    val orders = Tables(spark, dir, "orders")
      .selectExpr("CAST(o_orderdate AS STRING)",
        "CAST(round(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (java.time.LocalDate.parse(r.getString(0).take(10)), r.getLong(1)))
    val mind = orders.map(_._1.toEpochDay).min
    val span = orders.map(_._1.toEpochDay).max - mind + 1
    val cents = new Array[Long](64)
    orders.foreach { case (dt, c) =>
      cents(((dt.toEpochDay - mind) * 64 / span).toInt) += c
    }
    val g = cents.map(c => math.floorDiv(c, 100000))
    val s1 = g.scanLeft(0L)(_ + _)
    val s2 = g.scanLeft(0L)((a, v) => a + v * v)
    def sse(m: Int, i: Int): Long =
      (s2(i) - s2(m)) - math.floorDiv((s1(i) - s1(m)) * (s1(i) - s1(m)), i - m)
    val k1 = sse(0, 64)
    val k2 = (1 until 64).map(m => sse(0, m) + sse(m, 64)).min
    val k3 = (for { a <- 1 until 63; b <- (a + 1) until 64 }
      yield sse(0, a) + sse(a, b) + sse(b, 64)).min
    assert(got(0)._2 === k1)
    assert(got(1)._2 === k2)
    assert(got(2)._2 === k3)
  }

  test("q436: identities from a full JVM sort") {
    val cents = Tables(spark, dir, "orders")
      .selectExpr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    def disc(p: Double): Long = cents(math.ceil(p * n).toInt - 1)
    val (p05, p95) = (disc(0.05), disc(0.95))
    val r = q("q436_winsorized_stats").collect().head
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === p05)
    assert(r.getLong(2) === p95)
    assert(r.getLong(3) === cents.map(c => math.min(math.max(c, p05), p95)).sum)
    val inside = cents.filter(c => c >= p05 && c <= p95)
    assert(r.getLong(4) === inside.sum)
    assert(r.getLong(5) === inside.length.toLong)
    assert(r.getLong(6) === cents.count(_ < p05).toLong)
    assert(r.getLong(7) === cents.count(_ > p95).toLong)
    assert(r.getLong(6) <= n / 20 && r.getLong(7) <= n / 20,
      "discrete percentile clamps at most q*n per side")
  }

  test("q437: JVM stratified replay; paradox rows have majority reversal") {
    val rows = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"),
        col("c.c_custkey") === col("o.o_custkey"))
      .selectExpr("CAST(c.c_nationkey AS BIGINT)", "c.c_mktsegment",
        "CAST(round(o.o_totalprice, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val strata = rows.groupBy(r => (r._1, r._2))
      .map { case ((nat, seg), xs) => (nat, seg, xs.map(_._3).sum, xs.length.toLong) }
    def sgn(x: Long): Int = java.lang.Long.signum(x)
    val segs = rows.map(_._2).distinct.sorted
    val want = (for { a <- segs; b <- segs if a < b } yield {
      val sa = strata.filter(_._2 == a); val sb = strata.filter(_._2 == b)
      val (ta, ca) = (sa.map(_._3).sum, sa.map(_._4).sum)
      val (tb, cb) = (sb.map(_._3).sum, sb.map(_._4).sum)
      val aggSign = sgn(ta * cb - tb * ca)
      val pairs = for {
        x <- sa; y <- sb if x._1 == y._1
      } yield sgn(x._3 * y._4 - y._3 * x._4)
      val (pos, neg) = (pairs.count(_ == 1).toLong, pairs.count(_ == -1).toLong)
      val agree = aggSign match {
        case 1 => pos; case -1 => neg; case _ => pairs.size - pos - neg
      }
      val flip = aggSign match {
        case 1 => neg; case -1 => pos; case _ => pos + neg
      }
      val paradox = if (aggSign != 0 && flip > agree) 1 else 0
      (a, b, aggSign, pairs.size.toLong, agree, flip, paradox)
    }).sortBy(x => (x._1, x._2))
    val got = q("q437_simpsons_paradox").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(got.toSeq === want)
    got.filter(_._7 == 1).foreach { r =>
      assert(r._6 > r._5, s"flagged pair must have flips > agrees: $r")
    }
  }
}
