package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninety-second wave:
  *
  *  - q438: a plain-join JVM replay reproduces the reduced-join answer
  *    (Yannakakis' theorem: the full reducer never changes the
  *    result), and the dangling census is the difference the reducer
  *    actually removed;
  *  - q439: JVM replay of the KM table; the at-risk counts strictly
  *    decrease and the cumulative log-survival is non-increasing;
  *  - q440: the sweep-line identity holds EXACTLY (pinned by the
  *    query) and a JVM interval replay reproduces every field.
  */
class Training92Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q438: plain-join replay matches the reduced-join answer") {
    val regions = Tables(spark, dir, "region")
      .filter(col("r_name").isin("ASIA", "EUROPE"))
      .selectExpr("CAST(r_regionkey AS BIGINT)").collect().map(_.getLong(0)).toSet
    val nations = Tables(spark, dir, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name", "CAST(n_regionkey AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(n => regions(n._3)).map(n => n._1 -> n._2).toMap
    val custs = Tables(spark, dir, "customer")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(c => nations.contains(c._2)).toMap
    val orders = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(o => custs.contains(o._1))
    val byNation = orders.groupBy(o => nations(custs(o._1)))
    val urgentCusts = orders.map(_._1).toSet
    val want = byNation.map { case (nName, os) =>
      val regionCust = custs.filter { case (_, nk) => nations(nk) == nName }.keySet
      (nName, os.length.toLong, os.map(_._2).sum,
        regionCust.size.toLong, regionCust.count(urgentCusts).toLong,
        (regionCust.size - regionCust.count(urgentCusts)).toLong)
    }.toSeq.sortBy(_._1)
    val got = q("q438_yannakakis_reducer").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === want)
    got.foreach(r => assert(r._6 >= 0L))
  }

  test("q439: JVM KM replay; at-risk decreasing, log-survival non-increasing") {
    val durations = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "lineitem").as("l"),
        expr("l.l_orderkey = o.o_orderkey"))
      .groupBy("o.o_orderkey")
      .agg(expr("datediff(max(l.l_shipdate), max(o.o_orderdate))").as("t"))
      .filter(col("t") >= 0).select("t").collect().map(_.getInt(0))
    val n = durations.length.toLong
    val events = durations.filter(_ <= 60).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }.toSeq.sortBy(_._1)
    var seen = 0L; var cum = 0L
    val want = events.map { case (t, d) =>
      val nRisk = n - seen
      cum += math.round(math.log((nRisk - d) / nRisk.toDouble) * 1e6)
      seen += d
      (t, nRisk, d, cum)
    }
    val got = q("q439_kaplan_meier").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 < a._2, "at-risk must strictly decrease across event times")
      assert(b._4 <= a._4, "log-survival must not increase")
    }
  }

  test("q440: JVM sweep replay; the Little identity is exact") {
    val iv = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "lineitem").as("l"),
        expr("l.l_orderkey = o.o_orderkey"))
      .groupBy("o.o_orderkey")
      .agg(expr("CAST(max(o.o_orderdate) AS DATE)").as("s"),
        expr("CAST(max(l.l_shipdate) AS DATE)").as("e"))
      .filter(col("e") >= col("s"))
      .selectExpr("CAST(s AS STRING)", "CAST(e AS STRING)").collect()
      .map(r => (java.time.LocalDate.parse(r.getString(0)).toEpochDay,
        java.time.LocalDate.parse(r.getString(1)).toEpochDay))
    val n = iv.length.toLong
    val sumDur = iv.map(x => x._2 - x._1).sum
    val h0 = iv.map(_._1).min; val h1 = iv.map(_._2).max
    val deltas = (iv.map(x => (x._1, 1L)) ++ iv.map(x => (x._2, -1L)))
      .groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    var conc = 0L; var area = 0L
    deltas.sliding(2).foreach {
      case Seq((d0, dl), (d1, _)) => conc += dl; area += conc * (d1 - d0)
      case _ =>
    }
    val r = q("q440_littles_law_audit").collect().head
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === h1 - h0)
    assert(r.getLong(2) === sumDur)
    assert(r.getLong(3) === area)
    assert(r.getInt(4) === 1, "sweep integral must equal summed durations")
    assert(area === sumDur)
    assert(r.getLong(5) === area * 1000000L / (h1 - h0))
    assert(r.getLong(6) === n * 1000000L / (h1 - h0))
    assert(r.getLong(7) === sumDur * 1000000L / n)
  }
}
