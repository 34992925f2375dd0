package graft

import org.apache.spark.sql.functions._

/** Invariants for the hundred-sixth wave:
  *
  *  - q478: JVM java.time ISO week-date replay (IsoFields, a third
  *    implementation independent of both engines); mismatch days sit
  *    only in the Dec 29 – Jan 3 zone.
  *  - q479: JVM rolling median/MAD replay over the day dictionary; the
  *    Hampel flag law (|x − med| > 3·MAD) recounted; median is the
  *    lower middle of the ≤7-value window.
  *  - q480: JVM LEB128 size replay per source; varint never exceeds the
  *    fixed 8-byte baseline on these key gaps; savings_ppm recomputed.
  */
class Training106Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q478: java.time ISO replay; mismatches only at year edges") {
    import java.time.temporal.IsoFields
    val days = Tables(spark, dir, "orders")
      .selectExpr("CAST(o_orderdate AS DATE) AS day").distinct().collect()
      .map(_.getDate(0).toLocalDate)
    val mism = days.filter(d => d.get(IsoFields.WEEK_BASED_YEAR) != d.getYear)
    val want = mism.groupBy(_.getYear).map { case (y, xs) =>
      y.toLong -> ((xs.length.toLong, xs.min, xs.max,
        xs.map(_.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR).toLong).min,
        xs.map(_.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR).toLong).max))
    }
    val got = q("q478_iso_week_census").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate,
        r.getDate(3).toLocalDate, r.getLong(4), r.getLong(5)))
    assert(got.length === want.size)
    got.foreach { case (y, n, f, l, wmin, wmax) =>
      assert((n, f, l, wmin, wmax) === want(y), s"year $y")
    }
    mism.foreach { d =>
      val md = d.getMonthValue * 100 + d.getDayOfMonth
      assert(md >= 1229 || md <= 103, s"$d outside the ISO edge zone")
    }
  }

  test("q479: JVM rolling median/MAD replay; flag law") {
    val daily = Tables(spark, dir, "orders")
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(expr("CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS BIGINT)").as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1)
    val byDay = daily.toMap
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    val want = daily.map { case (d, v) =>
      val win = (-3 to 3).flatMap(k => byDay.get(d.plusDays(k)))
      val med = lowerMedian(win)
      val mad = lowerMedian(win.map(x => math.abs(x - med)))
      (d, v, med, mad, if (math.abs(v - med) > 3 * mad) 1L else 0L)
    }
    val got = q("q479_hampel_filter").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === want)
  }

  test("q480: JVM LEB128 replay; varint never loses to fixed") {
    def leb(x: Long): Long = {
      var b = 1L
      while (b < 10 && x >= BigInt(2).pow(7 * b.toInt).toLong) b += 1
      b
    }
    def leg(name: String, keys: Array[Long]): (String, Long, Long, Long) = {
      val ks = keys.distinct.sorted
      val deltas = ks.zip(0L +: ks.dropRight(1)).map { case (a, b) => a - b }
      (name, ks.length.toLong, ks.length * 8L, deltas.map(leb).sum)
    }
    val want = Seq(
      leg("documents", Tables(spark, dir, "documents").select("doc_id")
        .collect().map(_.getLong(0))),
      leg("events", Tables(spark, dir, "events").select("event_id")
        .collect().map(_.getLong(0))),
      leg("orders", Tables(spark, dir, "orders").select("o_orderkey")
        .collect().map(_.getLong(0)))).sortBy(_._1)
    val got = q("q480_varint_delta_size").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === 3)
    got.zip(want).foreach { case ((s, n, fb, vb, sp), (ws, wn, wfb, wvb)) =>
      assert(s === ws); assert(n === wn); assert(fb === wfb)
      assert(vb === wvb, s"varint bytes for $s")
      assert(vb <= fb, "varint never loses on positive gaps")
      assert(sp === (fb - vb) * 1000000L / fb)
    }
  }
}
