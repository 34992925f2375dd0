package graft

import org.apache.spark.sql.functions._

/** Invariants for the eighty-first wave:
  *
  *  - q408: under the declared confs the optimized plan really carries
  *    the injected bloom filter (creation-side bloom_filter_agg +
  *    application-side BloomFilterMightContain), and the census
  *    equals the plain join;
  *  - q409: the snapshot store holds exactly one version per distinct
  *    batch (the duplicate delivery created none), the ledger has one
  *    mark per batch, and the final snapshot census equals the batch
  *    truth.
  */
class Training81Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q408: the injected runtime bloom filter appears in the plan") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "1KB")
      val df = graft.queries.Training81.bloomJoin(spark,
        "/root/testdata/sf0.01")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg"),
        s"creation side must aggregate a bloom filter:\n${plan.take(800)}")
      assert(plan.contains("might_contain") ||
        plan.contains("BloomFilterMightContain"),
        s"application side must probe the filter:\n${plan.take(800)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
    // census parity with the un-tuned plain join
    val got = q("q408_runtime_bloom_filter").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = graft.queries.Training81.bloomJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
  }

  test("q409: one snapshot version per batch; duplicate created none") {
    val got = q("q409_stream_foreachbatch_cas").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = Tables(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), countDistinct("o_orderkey").as("k"),
        sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("c"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq)
    val stage = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_febcas_${Integer.toHexString(dir.hashCode)}").toString
    val nBatches = new java.io.File(s"$stage/in").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nBatches === 3, "staging must produce 3 batch files")
    val versions = graft.sources.Sinks.snapshotVersions(s"$stage/snap")
    assert(versions.size === nBatches,
      s"duplicate delivery must not add a version: $versions")
    val marks = new java.io.File(s"$stage/ledger").listFiles()
      .map(_.getName).sorted
    assert(marks.toSeq === (0 until nBatches).map(i => s"batch-$i"))
  }
}
