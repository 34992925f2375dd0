package graft

import org.apache.spark.sql.functions._

/** Invariants for the nineteenth wave (q213-q216): JVM recounts of the
  * pruning simulation (slab stats + overlap walk), the run-length
  * encoding (sequential fold per user), the constrained funnel
  * (three-stage scan), and the price audit (BigInt cents) — plus the
  * structural facts: pruned+scanned tiles the slab set, runs conserve
  * events, funnel stages are monotone.
  */
class Training19Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q213: pruning table equals a JVM slab walk; scanned+pruned tiles the slabs") {
    val li = Tables(spark, dir, "lineitem")
      .selectExpr("CAST(l_orderkey / 100 AS LONG) AS fid",
        "CAST(l_shipdate AS DATE) AS d").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val slabs = li.groupBy(_._1).map { case (fid, g) =>
      (fid, g.map(_._2).min, g.map(_._2).max, g.length.toLong)
    }.toSeq
    val d0 = slabs.map(_._2).min
    val want = (0L until 12L).map { p =>
      val lo = d0.plusDays(p * 30); val hi = d0.plusDays(p * 30 + 29)
      val scanned = slabs.filter(s =>
        !s._2.isAfter(hi) && !s._3.isBefore(lo))
      (p, (scanned.size.toLong, slabs.size - scanned.size.toLong,
        scanned.map(_._4).sum))
    }.toMap
    val got = q("q213_minmax_pruning").collect()
      .map(r => r.getAs[Long]("probe") ->
        ((r.getAs[Long]("files_scanned"), r.getAs[Long]("files_pruned"),
          r.getAs[Long]("rows_scanned")))).toMap
    assert(got == want)
    got.values.foreach { case (s, pr, _) =>
      assert(s + pr == slabs.size.toLong)
    }
  }

  test("q214: RLE equals a JVM sequential fold; runs conserve events") {
    val ev = Tables(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = ev.groupBy(_._1).map { case (u, g) =>
      val types = g.sortBy(e => (e._2, e._3)).map(_._4)
      val runLens = types.foldLeft(List.empty[(String, Long)]) {
        case ((t, n) :: rest, x) if t == x => (t, n + 1) :: rest
        case (acc, x) => (x, 1L) :: acc
      }.map(_._2)
      u -> ((types.length.toLong, runLens.length.toLong, runLens.max))
    }
    val got = q("q214_event_runs").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_runs"),
          r.getAs[Long]("max_run")))).toMap
    assert(got == want)
    got.values.foreach { case (n, runs, mx) =>
      assert(runs <= n && mx <= n && runs * mx >= n)
    }
  }

  test("q215: funnel stages equal a JVM three-stage scan and are monotone") {
    val hourUs = 3600000000L
    val ev = Tables(spark, dir, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS ts_us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val want = byUser.flatMap { case (_, g) =>
      val views = g.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val v = views.min
        val clicks = g.filter(e => e._2 == "click" && e._3 > v &&
          e._3 <= v + hourUs).map(_._3)
        if (clicks.isEmpty) Some(1)
        else {
          val c = clicks.min
          val purch = g.filter(e => e._2 == "purchase" && e._3 > c &&
            e._3 <= c + hourUs)
          if (purch.isEmpty) Some(2) else Some(3)
        }
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("q215_constrained_funnel").collect()
      .map(r => r.getAs[Int]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(got == want)
    assert(got.values.sum == byUser.count(_._2.exists(_._2 == "view")).toLong)
  }

  test("q216: price audit equals a BigInt cents recount") {
    def cents(x: Double): Long = math.round(x * 100)
    val lines = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
      .collect()
      .map(r => (r.getLong(0),
        math.round(r.getDouble(1) * (1 - r.getDouble(2)) *
          (1 + r.getDouble(3)) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val orders = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
    val withLines = orders.filter(o => lines.contains(o._1))
    val r = q("q216_price_audit").collect().head
    assert(r.getAs[Long]("n_orders") == orders.length.toLong)
    assert(r.getAs[Long]("n_with_lines") == withLines.length.toLong)
    assert(r.getAs[Long]("n_exact_match") ==
      withLines.count(o => lines(o._1) == o._2).toLong)
    assert(r.getAs[Long]("max_abs_diff_cents") ==
      withLines.map(o => math.abs(o._2 - lines(o._1))).max)
  }
}
