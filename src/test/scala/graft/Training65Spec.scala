package graft

import org.apache.spark.sql.functions._

/** Invariants for the sixty-fifth wave:
  *
  *  - q362: IDENTIFIER resolution equals the statically-named query,
  *    and a hostile variable value FAILS analysis instead of splicing
  *    (the injection-safety property the clause exists for);
  *  - q363: the two-pass median equals a JVM full-sort median, and
  *    pass 2 really is a small fraction of the data;
  *  - q364: arrival-phase stub bucket + backfill conservation law
  *    re-derived in the JVM (total orders constant across phases);
  *  - q365: the CDC-applied census equals a JVM replay of the change
  *    log, and all three op kinds fire.
  */
class Training65Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q362: IDENTIFIER equals static SQL; hostile identifier fails analysis") {
    val got = q("q362_sql_identifier_clause").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Tables(spark, dir, "orders")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want)
    // injection attempt: a value that would change semantics if spliced
    spark.sql("SET VAR graft_dim_col = 'o_orderpriority; DROP TABLE x'")
    val ex = intercept[Exception] {
      spark.sql("SELECT IDENTIFIER(graft_dim_col) FROM graft_ord_idf LIMIT 1")
        .collect()
    }
    assert(ex.getMessage.contains("INVALID_IDENTIFIER") ||
      ex.getMessage.toLowerCase.contains("parse") ||
      ex.getMessage.toLowerCase.contains("invalid"), ex.getMessage)
  }

  test("q363: two-pass median equals JVM full-sort; pass 2 is small") {
    val r = q("q363_twopass_exact_median").collect().head
    val cents = Tables(spark, dir, "lineitem")
      .select(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted
    val k = (cents.length + 1) / 2
    assert(r.getLong(0) === cents.length.toLong)
    assert(r.getLong(1) === cents(k - 1))
    assert(r.getLong(2) < cents.length / 100,
      s"pass2 not small: ${r.getLong(2)} of ${cents.length}")
  }

  test("q364: stub bucket appears at arrival, drains at backfill; totals conserved") {
    val rows = q("q364_late_arriving_dim").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val arrival = rows.filter(_._1._1 == "arrival")
    val backfill = rows.filter(_._1._1 == "backfill")
    assert(arrival.keys.exists(_._2 == "<stub>"), "no stub bucket fired")
    assert(!backfill.keys.exists(_._2 == "<stub>"), "stub survived backfill")
    assert(arrival.values.sum === backfill.values.sum, "orders not conserved")
    val total = Tables(spark, dir, "orders").count()
    assert(backfill.values.sum === total)
    // each real segment can only GAIN orders when stubs reconcile
    backfill.foreach { case ((_, seg), n) =>
      assert(n >= arrival.getOrElse(("arrival", seg), 0L), seg)
    }
  }

  test("q365: CDC census equals a JVM log replay; all op kinds fire") {
    val base = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(base.exists(_._1 % 5 == 0), "no update rows")
    assert(base.exists(_._1 % 10 == 3), "no delete rows")
    val want = base.filter(_._1 % 10 != 3)
      .map { case (k, p, c) => (p, if (k % 5 == 0) 2 * c else c) }
      .groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val got = q("q365_stream_cdc_apply").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }
}
