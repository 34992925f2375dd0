package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Invariants for the hundred-first wave:
  *
  *  - q465: JVM distinct-set recount per segment; the physical plan
  *    contains the Expand operator (the multi-distinct rewrite) — and
  *    exactly one scan of each input.
  *  - q466: JVM bitemporal replay; knowledge monotonicity — for a fixed
  *    valid time, moving the transaction clock forward never loses
  *    orders and never lowers the believed total (corrections are
  *    strictly upward here).
  *  - q467: JVM plain-left-join recount equals the split rewrite; the
  *    physical plan broadcasts the dim and the join input filters out
  *    null keys (the rewrite's whole point).
  */
class Training101Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q465: JVM distinct recount; Expand operator in the plan") {
    val rows = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"), expr("c.c_custkey = o.o_custkey"))
      .selectExpr("c.c_mktsegment AS seg", "o.o_custkey AS ck",
        "o.o_orderpriority AS pr", "month(o.o_orderdate) AS mo")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
    val want = rows.groupBy(_._1).map { case (seg, xs) =>
      seg -> ((xs.map(_._2).distinct.length.toLong,
        xs.map(_._3).distinct.length.toLong,
        xs.map(_._4).distinct.length.toLong, xs.length.toLong))
    }
    val df = q("q465_multi_distinct_expand")
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === want.size)
    got.foreach { case (seg, nc, np, nm, no) =>
      assert((nc, np, nm, no) === want(seg), s"segment $seg")
    }
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("Expand"), plan)
  }

  test("q466: JVM bitemporal replay; knowledge monotone in tx time") {
    val orders = Tables(spark, dir, "orders")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS od",
        "o_orderstatus", "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2), r.getLong(3)))
    val vs = Seq("1996-06-01", "1999-06-01", "2001-06-01").map(java.time.LocalDate.parse)
    val ts = Seq("1996-09-01", "1999-09-01", "2001-09-01").map(java.time.LocalDate.parse)
    def believed(v: java.time.LocalDate, tt: java.time.LocalDate): (Long, Long) = {
      var n = 0L; var tot = 0L
      orders.foreach { case (_, od, st, c) =>
        val corrected = st == "F"
        val txCorr = od.plusDays(90)
        // v1 row: valid [od, inf), tx [od, corrected ? od+90 : inf)
        val v1 = !od.isAfter(v) && !od.isAfter(tt) &&
          (!corrected || tt.isBefore(txCorr))
        // v2 row: valid [od, inf), tx [od+90, inf)
        val v2 = corrected && !od.isAfter(v) && !txCorr.isAfter(tt)
        if (v1) { n += 1; tot += c }
        if (v2) { n += 1; tot += c * 11 / 10 }
      }
      (n, tot)
    }
    val got = q("q466_bitemporal_asof").collect()
      .map(r => ((r.getDate(0).toLocalDate, r.getDate(1).toLocalDate),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got.size === 9)
    for (v <- vs; tt <- ts) assert(got((v, tt)) === believed(v, tt), s"cell ($v, $tt)")
    for (v <- vs; Seq(t1, t2) <- ts.sliding(2)) {
      assert(got((v, t2))._1 >= got((v, t1))._1, "order count monotone in tx")
      assert(got((v, t2))._2 >= got((v, t1))._2, "believed total monotone in tx")
    }
  }

  test("q467: JVM plain-join recount; broadcast + null-free join input") {
    val supNation = Tables(spark, dir, "supplier").as("s")
      .join(Tables(spark, dir, "nation").as("n"),
        expr("n.n_nationkey = s.s_nationkey"))
      .selectExpr("s.s_suppkey", "n.n_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val facts = Tables(spark, dir, "lineitem")
      .selectExpr("l_linenumber", "l_suppkey",
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val want = facts.groupBy { case (ln, sk, _) =>
      if (ln == 1) "UNKNOWN" else supNation.getOrElse(sk, "UNKNOWN")
    }.map { case (k, xs) => k -> ((xs.length.toLong, xs.map(_._3).sum)) }
    val df = q("q467_null_skew_split")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === want.size)
    got.foreach { case (k, n, rev) => assert((n, rev) === want(k), s"bucket $k") }
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the isNotNull(sk) guard gets pushed through the CASE projection:
    // Filter CASE WHEN (l_linenumber = 1) THEN false ELSE isnotnull(l_suppkey)
    assert(plan.contains("ELSE isnotnull(l_suppkey"),
      s"null keys must be filtered before the join:\n$plan")
    assert(plan.contains("Union"), plan)
  }
}
