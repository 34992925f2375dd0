package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The DSv2 connector's contracts: exact round-trip vs the parquet
  * original, stats-based block pruning visible in the executed plan,
  * payload skipping under column pruning, and filters staying residual
  * (pruning never changes results).
  */
class GbdSourceSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private lazy val shard = GbdFormat.stageDocuments(spark, dir, blockRecords = 64)
  private def gbd = spark.read.format("graft.sources.GbdSource").load(shard)

  test("round-trip: every (doc_id, lang, payload) matches the parquet original") {
    val got = gbd.select(col("doc_id"), col("lang"), col("payload").cast("string").as("text"))
    val want = Tables(spark, dir, "documents").select("doc_id", "lang", "text")
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("block pruning: a doc_id range schedules only the overlapping blocks") {
    val df = gbd.filter(col("doc_id") >= 64 && col("doc_id") < 192)
    val desc = df.queryExecution.executedPlan.toString
    // 500 docs / 64 per block = 8 blocks; [64, 192) overlaps exactly 2
    assert(desc.contains("blocks=2/8"), s"plan did not prune:\n$desc")
    // and pruning kept every matching row
    assert(df.count() == 128)
  }

  test("column pruning: payload is not materialized for a metadata-only scan") {
    val df = gbd.filter(col("doc_id") < 64).select("doc_id", "lang")
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("cols=doc_id,lang"), s"payload not pruned:\n$desc")
    assert(df.count() == 64)
  }

  test("count(*) pushdown: answered from the index; filtered counts still scan") {
    val agg = gbd.groupBy().count()
    val desc = agg.queryExecution.executedPlan.toString
    assert(desc.contains("count-pushdown") && desc.contains("index-only"),
      s"count not index-answered:\n$desc")
    assert(agg.collect()(0).getLong(0) === 500L)
    assert(gbd.count() === 500L)
    // with a WHERE clause the filter stays residual, so aggregate
    // pushdown must NOT fire and the count must come from real rows
    val filtered = gbd.filter(col("doc_id") < 64).groupBy().count()
    val fdesc = filtered.queryExecution.executedPlan.toString
    assert(!fdesc.contains("count-pushdown"), s"filtered count wrongly pushed:\n$fdesc")
    assert(filtered.collect()(0).getLong(0) === 64L)
  }

  test("count(*) is truly index-only: succeeds with the shard data file ABSENT") {
    // stage an index with no data file: any plan that opens the shard
    // fails, so a correct answer proves zero data bytes were read
    val ghost = java.nio.file.Files.createTempDirectory("gbd_ghost")
      .resolve("ghost.gbd")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(shard + ".gbx"),
      java.nio.file.Paths.get(ghost.toString + ".gbx"))
    val n = spark.read.format("graft.sources.GbdSource").load(ghost.toString)
      .groupBy().count().collect()(0).getLong(0)
    assert(n === 500L)
  }

  test("min/max(doc_id) pushdown: index-answered, mixed with count, data file optional") {
    val agg = gbd.agg(count(lit(1)), min(col("doc_id")), max(col("doc_id")))
    val desc = agg.queryExecution.executedPlan.toString
    assert(desc.contains("agg-pushdown") && desc.contains("min(doc_id)")
      && desc.contains("index-only"), s"min/max not index-answered:\n$desc")
    val r = agg.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((500L, 0L, 499L)))
    // with a residual filter the pushdown must NOT fire
    val fdesc = gbd.filter(col("doc_id") < 64)
      .agg(min(col("doc_id"))).queryExecution.executedPlan.toString
    assert(!fdesc.contains("agg-pushdown"), s"filtered min wrongly pushed:\n$fdesc")
    // a non-indexed column declines pushdown (scans real data)
    val ldesc = gbd.agg(min(col("lang"))).queryExecution.executedPlan.toString
    assert(!ldesc.contains("agg-pushdown"), s"min(lang) wrongly pushed:\n$ldesc")
    // index-only proof: answers with the shard data file ABSENT
    val ghost = java.nio.file.Files.createTempDirectory("gbd_ghost_mm")
      .resolve("ghost.gbd")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(shard + ".gbx"),
      java.nio.file.Paths.get(ghost.toString + ".gbx"))
    val g = spark.read.format("graft.sources.GbdSource").load(ghost.toString)
      .agg(min(col("doc_id")), max(col("doc_id"))).collect()(0)
    assert((g.getLong(0), g.getLong(1)) === ((0L, 499L)))
  }

  test("filters are residual: a predicate the index can't prune still filters rows") {
    // lang equality is not pushed (only doc_id is); Spark must apply it
    val perLang = gbd.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(gbd.filter(col("lang") === lang).count() == n)
    }
    // and a doc_id predicate inside a surviving block is re-applied
    // row-by-row (block granularity is 64, the range is narrower)
    assert(gbd.filter(col("doc_id") >= 70 && col("doc_id") < 80).count() == 10)
  }

  test("distributed write: N partitions -> N pruned-readable shards, exact round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("gbd_write_spec").toString
    // range-cluster the shards: a min/max index is only selective when
    // the layout is id-clustered (the Z-order/q118 discipline) — range
    // partition across shards, sort within each
    val src = Tables(spark, this.dir, "documents")
      .selectExpr("doc_id", "lang", "CAST(text AS BINARY) AS payload")
      .repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions("doc_id")
    src.write.format("graft.sources.GbdSource")
      .option("blockRecords", 32).mode("append").save(dir)
    val shards = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gbd"))
    assert(shards.length == 4, shards.mkString(","))
    assert(shards.forall(s => new java.io.File(s.getPath + ".gbx").exists()))
    // exact round-trip through the directory read path
    val back = spark.read.format("graft.sources.GbdSource").load(dir)
      .select(col("doc_id"), col("lang"), col("payload").cast("string").as("text"))
    val want = Tables(spark, this.dir, "documents").select("doc_id", "lang", "text")
    assert(back.exceptAll(want).count() == 0)
    assert(want.exceptAll(back).count() == 0)
    // block pruning works across shards: with range-clustered shards the
    // doc_id < 100 predicate drops whole non-overlapping shards (every
    // block in their index fails) and keeps only the head of shard 0
    val filtered = spark.read.format("graft.sources.GbdSource").load(dir)
      .filter(col("doc_id") < 100)
    val desc = filtered.queryExecution.executedPlan.toString
    val re = "blocks=(\\d+)/(\\d+)".r
    val m = re.findFirstMatchIn(desc).get
    assert(m.group(2).toInt > m.group(1).toInt, desc) // some blocks pruned
    assert(filtered.count() == 100)
  }

  test("null semantics: write->read preserves NULL vs empty for lang and payload") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gbd_null_spec").toString
    val src = Seq(
      (1L, null.asInstanceOf[String], null.asInstanceOf[Array[Byte]]),
      (2L, "", Array.emptyByteArray),
      (3L, "en", "body".getBytes("UTF-8")))
      .toDF("doc_id", "lang", "payload")
    src.write.format("graft.sources.GbdSource")
      .option("blockRecords", 2).mode("append").save(dir)
    val back = spark.read.format("graft.sources.GbdSource").load(dir)
      .orderBy("doc_id").collect()
    assert(back(0).isNullAt(1) && back(0).isNullAt(2), "row 1 must read back NULLs")
    assert(back(1).getString(1) == "" &&
      back(1).getAs[Array[Byte]](2).isEmpty, "row 2 must stay empty, not null")
    assert(back(2).getString(1) == "en" &&
      new String(back(2).getAs[Array[Byte]](2), "UTF-8") == "body")
  }
}
