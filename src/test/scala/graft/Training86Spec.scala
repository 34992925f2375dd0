package graft

import org.apache.spark.sql.functions._

/** Invariants for the eighty-sixth wave:
  *
  *  - q422: the chosen grain really is the finest k-satisfying one
  *    (JVM lattice replay), and exactly one grain is chosen;
  *  - q423: burn rates re-derive from a JVM recount and the
  *    multi-window rule suppresses single-window blips (an hour can
  *    exceed the short threshold without alerting when the day is
  *    healthy);
  *  - q424: the unpivot round-trip exactly restores the long form for
  *    BOTH measures.
  */
class Training86Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q422: finest k-satisfying grain chosen; lattice replay agrees") {
    val rows = q("q422_generalization_lattice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.length === 3, "all three grains reported")
    assert(rows.count(_._4) <= 1, "at most one grain chosen")
    val base = Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .selectExpr("n_name", "c_mktsegment",
        "CAST(round(c_acctbal, 0) AS BIGINT) div 1000")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def minClass(key: ((String, String, Long)) => Any): Long =
      base.groupBy(key).values.map(_.size).min.toLong
    val want = Seq(
      ("1_nation_segment_balance", minClass(identity)),
      ("2_nation_segment", minClass(r => (r._1, r._2))),
      ("3_nation", minClass(_._1)))
    assert(rows.map(r => (r._1, r._2)).toSeq === want)
    val chosen = rows.find(_._4).map(_._1)
    val wantChosen = want.find(_._2 >= 5L).map(_._1)
    assert(chosen === wantChosen,
      s"chosen grain must be the finest k-satisfying one (got $chosen)")
    // and every finer grain than the chosen one violates k
    wantChosen.foreach { wc =>
      want.takeWhile(_._1 != wc).foreach { case (g, m) =>
        assert(m < 5L, s"finer grain $g should have violated k")
      }
    }
    // at sf0.01 a grain must qualify — the decision step really fires
    val at01 = SparkEntry.allDefs.find(_.name == "q422_generalization_lattice")
      .get.fn(spark, "/root/testdata/sf0.01").collect()
    assert(at01.count(_.getBoolean(3)) === 1,
      "a grain must be chosen at sf0.01")
  }

  test("q423: burn rates re-derive; multi-window rule suppresses blips") {
    val ev = Tables(spark, dir, "events").selectExpr("to_date(ts)",
      "hour(ts)", "CASE WHEN event_type = 'error' THEN 1L ELSE 0L END")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    def ppm(e: Long, n: Long): Long = (2 * 1000000 * e + n) / (2 * n)
    val daily = ev.groupBy(_._1).view.mapValues { g =>
      ppm(g.map(_._3).sum, g.length.toLong) }.toMap
    val hourly = ev.groupBy(r => (r._1, r._2)).view.mapValues { g =>
      ppm(g.map(_._3).sum, g.length.toLong) }.toMap
    val want = daily.keys.toSeq.sorted.map { day =>
      val hours = hourly.filter(_._1._1 == day).values
      (day, daily(day), hours.max,
        hours.count(h => h > 40000L && daily(day) > 40000L).toLong)
    }
    val got = q("q423_slo_burn_rate").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === want)
    // suppression evidence: somewhere an hour clears the short
    // threshold while its day does not alert
    val suppressed = want.exists { case (day, lp, ms, na) =>
      ms > 40000L && (lp <= 40000L) && na == 0L
    }
    val anyHot = want.exists(_._3 > 40000L)
    assert(!anyHot || suppressed || want.exists(_._4 > 0L),
      "hot hours must either alert (hot day) or be suppressed")
  }

  test("q424: unpivot round-trip restores both measures exactly") {
    val got = q("q424_multi_measure_unpivot").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")),
        sum(expr("CAST(l_quantity AS BIGINT)")))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
    assert(got.map(_._1).toSeq === Seq("A", "N", "R"))
  }
}
