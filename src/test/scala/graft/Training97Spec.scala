package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninety-seventh wave:
  *
  *  - q453: JVM replay of the full nearest-neighbor profile; discords
  *    are the profile maxima, the motif pair's distance is the global
  *    profile minimum, and motif distance ≤ every discord distance;
  *  - q454: JVM replay of the ventile curve; the Lorenz curve is
  *    monotone, convex-ish (share below population share), ends at
  *    1e6, and the Gini is in [0, 1e6);
  *  - q455: JVM replay of the 2×2 cells; OR and RR land on the same
  *    side of 1 (they always agree in direction under the same
  *    correction).
  */
class Training97Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q453: JVM profile replay; motif <= discords") {
    val days = Tables(spark, dir, "orders")
      .groupBy("o_orderdate")
      .agg(expr("CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) div 100000 AS BIGINT)").as("v"))
      .orderBy("o_orderdate").select("v").collect().map(_.getLong(0))
    val n = days.length
    val wv = (0 until n - 6).map(i => days.slice(i, i + 7))
    def ssd(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val nn = wv.indices.map { i =>
      val cands = wv.indices.filter(j => math.abs(i - j) >= 7)
        .map(j => (ssd(wv(i), wv(j)), j)).min
      (i + 1L, cands._2 + 1L, cands._1) // 1-based to match row_number
    }
    val discords = nn.sortBy { case (i, _, s) => (-s, i) }.take(5)
    val motif = nn.filter { case (i, j, _) => i < j }
      .minBy { case (i, j, s) => (s, i, j) }
    val got = q("q453_matrix_profile_discord").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val gotD = got.filter(_._1 == "discord").sortBy(_._2)
    assert(gotD.map(x => (x._3, x._4, x._5)).toSeq === discords)
    val gotM = got.find(_._1 == "motif").get
    assert((gotM._3, gotM._4, gotM._5) === motif)
    assert(gotM._5 <= gotD.map(_._5).min, "motif is the closest pair")
  }

  test("q454: JVM ventile replay; Lorenz monotone below diagonal; Gini in range") {
    val spend = Tables(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(expr("CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS BIGINT)").as("x"))
      .selectExpr("o_custkey", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, x) => (x, k) }
    val n = spend.length.toLong; val sx = spend.map(_._2).sum
    val cums = spend.map(_._2).scanLeft(0L)(_ + _).drop(1)
    val want = (1 to 20).map { k =>
      val rn = (n * k / 20).toInt
      (k.toLong, k * 1000000L / 20, cums(rn - 1) * 1000000L / sx)
    }
    val gini = 1000000L -
      (want.map(_._3).zip(0L +: want.map(_._3).dropRight(1)).map { case (a, b) => a + b }.sum / 40)
    val got = q("q454_lorenz_gini").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(x => (x._1, x._2, x._3)).toSeq === want)
    assert(got.head._4 === gini)
    got.sliding(2).foreach { case Array(a, b) => assert(b._3 >= a._3) }
    got.foreach { case (_, pop, sp, _) => assert(sp <= pop, "Lorenz below diagonal") }
    assert(got.last._3 === 1000000L)
    assert(gini >= 0L && gini < 1000000L)
  }

  test("q455: JVM cell replay; OR and RR agree in direction") {
    val rows = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"),
        expr("c.c_custkey = o.o_custkey"))
      .selectExpr("CAST(c.c_nationkey AS BIGINT)",
        "CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END",
        "CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (nat, xs) =>
      val a = xs.count(x => x._2 == 1 && x._3 == 1).toLong
      val b = xs.count(x => x._2 == 1 && x._3 == 0).toLong
      val c = xs.count(x => x._2 == 0 && x._3 == 1).toLong
      val d = xs.count(x => x._2 == 0 && x._3 == 0).toLong
      val orp = (2 * a + 1) * (2 * d + 1) * 1000000L / ((2 * b + 1) * (2 * c + 1))
      val rrp = (2 * a + 1) * (2 * c + 2 * d + 2) * 1000000L /
        ((2 * c + 1) * (2 * a + 2 * b + 2))
      (nat, a, b, c, d, orp, rrp)
    }
    val got = q("q455_odds_ratio_suite").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === want)
    got.foreach { case (nat, _, _, _, _, orp, rrp) =>
      assert((orp >= 1000000L) === (rrp >= 1000000L) ||
        math.min(orp, rrp) > 900000L && math.max(orp, rrp) < 1100000L,
        s"nation $nat: OR $orp and RR $rrp disagree in direction")
    }
  }
}
