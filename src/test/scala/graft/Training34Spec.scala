package graft

/** Invariants for the thirty-fourth wave (q262-q265): the pivot/unpivot
  * round-trip identity, a JVM replay of the keyed OLS fit, the sliding
  * distinct vs direct recount, and the path miner vs a JVM replay.
  */
class Training34Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q262: pivot→unpivot round-trips the direct long aggregate; MoM deltas check out") {
    import org.apache.spark.sql.functions._
    val direct = Tables(spark, dir, "orders")
      .select(
        expr("CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)").as("month"),
        col("o_orderstatus").as("status"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
      .groupBy("month", "status").agg(sum("cents").as("rev"))
      .collect().map(r => ((r.getDate(0).toString, r.getString(1)), r.getLong(2)))
      .toMap
    val got = q("q262_sql_pivot_unpivot").collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // round-trip: every unpivoted row carries the direct aggregate
    assert(got.nonEmpty)
    got.foreach { case (m, st, rev, _) => assert(direct((m, st)) == rev) }
    assert(got.length == direct.size) // nothing dropped, nothing invented
    // MoM delta = rev - previous month's rev within the status
    got.groupBy(_._2).values.foreach { rows =>
      val seq = rows.sortBy(_._1)
      seq.zipWithIndex.foreach { case ((_, _, rev, mom), i) =>
        if (i == 0) assert(mom.isEmpty)
        else assert(mom.contains(rev - seq(i - 1)._3))
      }
    }
  }

  test("q263: per-nation slope matches a JVM least-squares replay") {
    import org.apache.spark.sql.functions._
    val rows = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01")).as("x"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val want = rows.groupBy(_._1).view.mapValues { rs =>
      val daily = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
      val n = daily.size.toLong
      val sx = daily.map(_._1).sum
      val sy = daily.map(t => BigInt(t._2)).sum
      val sxx = daily.map(t => t._1 * t._1).sum
      val sxy = daily.map(t => BigInt(t._1) * BigInt(t._2)).sum
      val num = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble
      val den = (n * sxx - sx * sx).toDouble
      (n, num / den)
    }.toSeq.sortBy(_._1)
    val got = q("q263_grouped_trend").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((nm, nd, slope), (nm2, (nd2, s2))) =>
      assert(nm == nm2 && nd == nd2)
      assert(math.abs(slope - s2) < 1e-3, s"$nm: $slope vs $s2")
    }
  }

  test("q264: each window's WAU equals a direct distinct recount over its 7 days") {
    val ud = Tables(spark, dir, "events")
      .selectExpr("to_date(ts) AS day", "user_id").distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val byDay = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = q("q264_sliding_distinct").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toSeq
    assert(got.map(_._1).toSet == byDay.keySet) // report range = observed days
    got.foreach { case (wend, wau) =>
      val want = (0 to 6).flatMap(i =>
        byDay.getOrElse(wend.minusDays(i.toLong), Set.empty[Long])).toSet.size
      assert(wau == want.toLong, s"$wend: $wau vs $want")
    }
  }

  test("q265: top paths equal a JVM replay of the first-3-events miner") {
    val ev = Tables(spark, dir, "events")
      .selectExpr("user_id", "to_date(ts) AS day", "unix_micros(ts) AS tsm",
        "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getLong(2), r.getLong(3), r.getString(4)))
    val want = ev.groupBy(t => (t._1, t._2)).values.collect {
      case rs if rs.length >= 3 =>
        rs.sortBy(t => (t._3, t._4)).take(3).map(_._5).mkString(">")
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (p, n) => (p, n) }
      .sortBy { case (p, n) => (-n, p) }.take(10)
    val got = q("q265_top_paths").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    got.foreach { case (p, _) => assert(p.split(">").length == 3) }
  }
}
