package graft

import org.apache.spark.sql.functions._

/** Invariants for the eighty-fifth wave:
  *
  *  - q419: the published metrics are the ENGINE's own counters (not
  *    recomputed data) — every operator row is non-negative and the
  *    join output ≥ agg groups ≥ 1;
  *  - q420: the nested plan contains NO Generate/Explode node, and the
  *    per-order lambdas re-derive from a JVM recount;
  *  - q421: the bad version v1 remains readable (forensics) AND is
  *    provably the corrupted content; the head equals v0.
  */
class Training85Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q419: metrics rows are live counters with sane ordering") {
    val got = q("q419_plan_metrics_audit").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ >= 0L), s"no metric may be missing: $got")
    val want = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
    assert(got("3_join_output") === want.count())
    assert(got("4_agg_groups") ===
      want.select("l_orderkey").distinct().count())
    assert(got("3_join_output") >= got("4_agg_groups"))
    assert(got("1_scan_lineitem") ===
      Tables(spark, dir, "lineitem").count())
  }

  test("q420: no explode in the plan; lambdas re-derive in the JVM") {
    val df = q("q420_nested_array_analytics")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Generate"),
      s"nested analytics must not explode:\n${plan.take(600)}")
    val want = Tables(spark, dir, "lineitem").selectExpr("l_orderkey",
      "CAST(round(l_extendedprice * 100, 0) AS BIGINT)", "l_returnflag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).values.map { g =>
        (g.length, g.map(_._2).sum, g.count(_._3 == "R").toLong)
      }.toSeq
      .groupBy(_._1).view.mapValues { g =>
        (g.size.toLong, g.map(_._2).sum, g.map(_._3).sum)
      }.toMap
    val got = df.collect()
      .map(r => r.getAs[Number](0).intValue() ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
  }

  test("q421: bad version stays readable; head equals v0") {
    val r = q("q421_snapshot_rollback").collect().head
    val base = Tables(spark, dir, "orders")
      .selectExpr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(_.getLong(0))
    assert(r.getLong(0) === base.length.toLong)
    assert(r.getLong(1) === base.sum)
    val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_rollback_${Integer.toHexString(dir.hashCode)}").toString
    assert(graft.sources.Sinks.snapshotVersions(root) === Seq(0L, 1L, 2L))
    // v1 forensics: the corrupted content is still there, unrewritten
    val v1sum = graft.sources.Sinks.readSnapshot(spark, root, 1L)
      .agg(sum("cents")).head().getLong(0)
    val wantV1 = Tables(spark, dir, "orders")
      .selectExpr("o_orderkey",
        "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c")
      .collect().map(r2 =>
        if (r2.getLong(0) % 3 == 0) r2.getLong(1) * 100 else r2.getLong(1))
      .sum
    assert(v1sum === wantV1, "the bad commit must remain for forensics")
    assert(v1sum > base.sum, "the corruption was real")
  }
}
