package graft

import java.time.{DayOfWeek, LocalDate}

import org.apache.spark.sql.functions._

/** Invariants for the hundred-seventh wave — all three replayed with
  * java.time (day-by-day where the query uses closed forms):
  *
  *  - q481: literal Mon–Fri iteration (signed, matching the closed
  *    form's h(b) − h(a)) matches the query; per pair |bus| ≤ |cal| and
  *    the signs agree.
  *  - q482: per-day fiscal mapping replay; the weeks of every
  *    (fy, period) rollup follow the 4-4-5 pattern (P12 absorbs week
  *    53); periods are 1..12.
  *  - q483: rule-by-rule day iteration (Mondays, month firsts, quarter
  *    starts, Friday-13ths, June 15ths) matches the relational
  *    expansion exactly.
  */
class Training107Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q481: literal business-day iteration; bounds") {
    val rows = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "lineitem").as("l"),
        expr("l.l_orderkey = o.o_orderkey"))
      .selectExpr("o.o_orderpriority", "CAST(o.o_orderdate AS DATE)",
        "CAST(l.l_shipdate AS DATE)")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    // SIGNED business-day difference: the harness data has ship dates
    // BEFORE order dates (synthetic, not TPC-H), and the closed form is
    // a signed h(b) − h(a) — iterate in the right direction and negate.
    def busBetween(a: LocalDate, b: LocalDate): Long =
      if (b.isBefore(a)) -busBetween(b, a)
      else Iterator.iterate(a.plusDays(1))(_.plusDays(1)).takeWhile(!_.isAfter(b))
        .count(d => d.getDayOfWeek.getValue <= 5).toLong
    rows.foreach { case (_, a, b) =>
      val bus = busBetween(a, b)
      val cal = a.until(b, java.time.temporal.ChronoUnit.DAYS)
      assert(math.abs(bus) <= math.abs(cal), s"|bus| <= |cal| for ($a, $b)")
      assert(bus * cal >= 0, s"same sign for ($a, $b)")
    }
    val want = rows.groupBy(_._1).map { case (p, xs) =>
      val cal = xs.map(x => x._2.until(x._3, java.time.temporal.ChronoUnit.DAYS)).sum
      val bus = xs.map(x => busBetween(x._2, x._3)).sum
      p -> ((xs.length.toLong, cal, bus, bus * 1000000L / xs.length))
    }
    val got = q("q481_business_days").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === want.size)
    got.foreach { case (p, n, cal, bus, ppm) =>
      assert((n, cal, bus, ppm) === want(p), s"priority $p")
    }
  }

  test("q482: java.time fiscal mapping replay; 4-4-5 law") {
    def fyStart(y: Int): LocalDate = {
      val feb1 = LocalDate.of(y, 2, 1)
      feb1.minusDays((feb1.getDayOfWeek.getValue - DayOfWeek.MONDAY.getValue).toLong)
    }
    def fiscal(d: LocalDate): (Long, Long) = {
      val fy = if (!d.isBefore(fyStart(d.getYear))) d.getYear else d.getYear - 1
      val w = fyStart(fy).until(d, java.time.temporal.ChronoUnit.DAYS) / 7
      val period =
        if (w >= 52) 12L
        else (w / 13) * 3 + (if (w % 13 < 4) 1L else if (w % 13 < 8) 2L else 3L)
      (fy.toLong, period)
    }
    val orders = Tables(spark, dir, "orders")
      .selectExpr("CAST(o_orderdate AS DATE)",
        "CAST(round(o_totalprice, 0) AS BIGINT)").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val want = orders.groupBy(x => fiscal(x._1)).map { case (k, xs) =>
      k -> ((xs.length.toLong, xs.map(_._2).sum))
    }
    val got = q("q482_fiscal_445").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    assert(got.length === want.size)
    got.foreach { case (k, v) =>
      assert(v === want(k), s"fiscal cell $k")
      assert(k._2 >= 1 && k._2 <= 12, "period in 1..12")
    }
  }

  test("q483: rule-by-rule java.time expansion") {
    val dayCounts = Tables(spark, dir, "orders")
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    def census(p: LocalDate => Boolean) = {
      val hit = dayCounts.filter(x => p(x._1))
      (hit.length.toLong, hit.map(_._1).min, hit.map(_._1).max, hit.map(_._2).sum)
    }
    val want = Map(
      "every_monday" -> census(_.getDayOfWeek == DayOfWeek.MONDAY),
      "first_of_month" -> census(_.getDayOfMonth == 1),
      "quarter_start" -> census(d => d.getDayOfMonth == 1 && d.getMonthValue % 3 == 1),
      "friday_13th" -> census(d => d.getDayOfWeek == DayOfWeek.FRIDAY && d.getDayOfMonth == 13),
      "mid_june" -> census(d => d.getMonthValue == 6 && d.getDayOfMonth == 15))
    val got = q("q483_cron_expansion").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toLocalDate,
        r.getDate(3).toLocalDate, r.getLong(4)))
    assert(got.length === want.size)
    got.foreach { case (rule, n, f, l, orders) =>
      assert((n, f, l, orders) === want(rule), s"rule $rule")
    }
  }
}
