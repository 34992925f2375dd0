package graft

import org.apache.spark.sql.functions._

/** Invariants for the sixty-second wave:
  *
  *  - q351: the streaming LEFT OUTER emission equals the BATCH left
  *    outer join (the lambda-parity identity), contains both matched
  *    and null-padded rows, and no sentinel leaks through;
  *  - q352: every delta term of the join-IVM algebra contributes rows
  *    (a silently-empty cross-delta term would still pass the oracle on
  *    data where the deltas never meet — the branch-firing discipline);
  *  - q353: change-type census re-derived from a JVM map compare;
  *  - q354: FD/IND verdicts re-derived via JVM sets.
  */
class Training62Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q351: streaming outer join equals the batch left outer join; both row kinds fire") {
    val got = q("q351_stream_outer_join").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3))).toSet
    val ev = Tables(spark, dir, "events")
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("vts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        col("ts").as("pts"))
    val want = v.join(p,
        col("user_id") === col("pu") &&
          col("pts") >= col("vts") &&
          col("pts") <= col("vts") + expr("interval 24 hours"),
        "left_outer")
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("pts")) - unix_micros(col("vts"))).as("lag_us"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3))).toSet
    assert(got === want)
    assert(got.exists(_._2 == -1L), "no unmatched (outer) rows fired")
    assert(got.exists(_._2 != -1L), "no matched rows fired")
    assert(!got.exists(_._3 < 0), "sentinel leaked into the result")
  }

  test("q352: all four IVM terms contribute (deltas meet on both sides)") {
    val o = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey")
    val c = Tables(spark, dir, "customer").select("c_custkey")
    def cnt(of: org.apache.spark.sql.Column, cf: org.apache.spark.sql.Column) =
      o.filter(of).join(c.filter(cf), col("o_custkey") === col("c_custkey")).count()
    val oo = cnt(col("o_orderkey") % 10 < 8, col("c_custkey") % 10 < 9)
    val dc = cnt(col("o_orderkey") % 10 < 8, col("c_custkey") % 10 >= 9)
    val od = cnt(col("o_orderkey") % 10 >= 8, col("c_custkey") % 10 < 9)
    val dd = cnt(col("o_orderkey") % 10 >= 8, col("c_custkey") % 10 >= 9)
    assert(oo > 0 && dc > 0 && od > 0 && dd > 0,
      s"a delta term is empty: $oo $dc $od $dd")
    val total = q("q352_ivm_join_view").collect().map(_.getLong(1)).sum
    assert(total === oo + dc + od + dd)
  }

  test("q353: SCD2 census re-derives from a JVM snapshot compare") {
    val rows = Tables(spark, dir, "customer")
      .select(col("c_custkey"),
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val v0 = rows.filter(_._1 % 13 != 0).toMap
    val v1 = rows.map { case (k, c) => k -> (if (k % 7 == 0) c * 2 else c) }.toMap
    val want = v1.keys.groupBy { k =>
      if (!v0.contains(k)) "insert"
      else if (v0(k) != v1(k)) "update"
      else "unchanged"
    }.view.mapValues(_.size.toLong).toMap
    val got = q("q353_scd2_build").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.view.mapValues(_._1).toMap === want)
    got.foreach { case (ct, (k, scd)) =>
      assert(scd === (if (ct == "update") 2 * k else k), ct)
    }
    assert(got.keySet === Set("insert", "update", "unchanged"))
  }

  test("q354: FD/IND verdicts re-derive via JVM sets") {
    val got = q("q354_dependency_discovery").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    val orders = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // fd o_orderkey -> o_custkey
    val g1 = orders.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(got("o_orderkey->o_custkey") ===
      ((g1.size.toLong, g1.values.count(_ > 1).toLong,
        g1.values.forall(_ <= 1))))
    // fd o_custkey -> o_orderpriority (expected violated on real data)
    val g2 = orders.groupBy(_._2).view.mapValues(_.map(_._3).distinct.size)
    assert(got("o_custkey->o_orderpriority") ===
      ((g2.size.toLong, g2.values.count(_ > 1).toLong,
        g2.values.forall(_ <= 1))))
    assert(!got("o_custkey->o_orderpriority")._3, "FD check never fired a violation")
    // ind o_custkey <= c_custkey
    val custs = Tables(spark, dir, "customer").select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val oc = orders.map(_._2).distinct
    val viol = oc.count(!custs.contains(_)).toLong
    assert(got("o_custkey<=c_custkey") === ((oc.length.toLong, viol, viol == 0)))
    assert(got("l_orderkey<=o_orderkey")._3, "the true FK must hold")
  }
}
