package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sinks API: sorted-file layout actually clusters values per file,
  * and the streaming MERGE-upsert snapshot converges to latest-version
  * -per-key across microbatches.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writeSorted clusters values within each output file") {
    val out = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    val df = (1 to 10000).map(i => ((i * 2654435761L) % 9973, i))
      .toDF("k", "v").repartition(4)
    Sinks.writeSorted(df, out, Seq("k"))
    // per input-file sortedness: within every parquet file the k column
    // is non-decreasing (row-group stats can skip on point lookups)
    val perFile = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .withColumn("prev", lag("k", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f").orderBy(
          monotonically_increasing_id())))
    val violations = perFile.filter(col("prev") > col("k")).count()
    assert(violations === 0L)
  }

  test("streamUpsert: snapshot converges to latest version per key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val root = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upsert_ck").toString
    val q = Sinks.streamUpsert(
      mem.toDF().toDF("k", "ver", "payload"), ckpt, root,
      keyCols = Seq("k"), versionCol = "ver")
    try {
      mem.addData((1L, 1L, "a1"), (2L, 1L, "b1"))
      q.processAllAvailable()
      mem.addData((1L, 2L, "a2"), (3L, 1L, "c1"))
      q.processAllAvailable()
      val got = Sinks.readLatestSnapshot(spark, root)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got === Map(
        1L -> (2L, "a2"), 2L -> (1L, "b1"), 3L -> (1L, "c1")))
    } finally q.stop()
  }

  test("time travel: old versions readable after upserts; AS OF resolves downward; read is pruned") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val root = java.nio.file.Files.createTempDirectory("graft_tt").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tt_ck").toString
    val q = Sinks.streamUpsert(
      mem.toDF().toDF("k", "ver", "payload"), ckpt, root,
      keyCols = Seq("k"), versionCol = "ver")
    try {
      mem.addData((1L, 1L, "a1"), (2L, 1L, "b1"))
      q.processAllAvailable()
      mem.addData((1L, 2L, "a2"), (3L, 1L, "c1"))
      q.processAllAvailable()
      assert(Sinks.snapshotVersions(root) === Seq(0L, 1L))
      def asMap(v: Long) = Sinks.readSnapshot(spark, root, v)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      // v0 is untouched by the v1 upsert
      assert(asMap(0L) === Map(1L -> (1L, "a1"), 2L -> (1L, "b1")))
      // AS OF a version between/after commits resolves to the newest ≤ it
      assert(asMap(5L) === Map(
        1L -> (2L, "a2"), 2L -> (1L, "b1"), 3L -> (1L, "c1")))
      // before the first commit: loud error, not an empty frame
      intercept[RuntimeException](Sinks.readSnapshot(spark, root, -1L))
      // pruned read: the v0 read touches only the v0 directory's files
      val files = Sinks.readSnapshot(spark, root, 0L)
        .select(input_file_name()).distinct().collect().map(_.getString(0))
      assert(files.nonEmpty && files.forall(_.contains("/v0/")))
    } finally q.stop()
  }

  test("snapshotChanges classifies insert/update/delete; NULL values never fake a delete") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    // hand-built chain (mergeSnapshot can't delete): v0 = {1,2,4-null},
    // v1 = {2 modified, 3 new, 4-null unchanged} — 1 deleted
    Seq((1L, Option("a"), 0L), (2L, Option("b"), 0L), (4L, Option.empty[String], 0L))
      .toDF("k", "payload", "v").write.parquet(s"$root/v0")
    Seq((2L, Option("B"), 1L), (3L, Option("c"), 1L), (4L, Option.empty[String], 1L))
      .toDF("k", "payload", "v").write.parquet(s"$root/v1")
    val got = Sinks.snapshotChanges(spark, root, 0L, 1L, Seq("k"))
      .select("k", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // key 4 (null payload on both sides, v changed) is an update of v;
    // the presence markers keep it from classifying as insert/delete
    assert(got === Map(1L -> "delete", 2L -> "update", 3L -> "insert", 4L -> "update"))
    val payloadOnly = {
      // rebuild with v dropped so only payload counts as a value column
      val root2 = java.nio.file.Files.createTempDirectory("graft_cdc2").toString
      spark.read.parquet(s"$root/v0").drop("v").write.parquet(s"$root2/v0")
      spark.read.parquet(s"$root/v1").drop("v").write.parquet(s"$root2/v1")
      Sinks.snapshotChanges(spark, root2, 0L, 1L, Seq("k"))
        .select("k", "change_type").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(payloadOnly === Map(1L -> "delete", 2L -> "update", 3L -> "insert"),
      "null-payload row with no changed column must be dropped as unchanged")
  }

  test("additive schema evolution: new columns join the snapshot, history reads NULL") {
    val root = java.nio.file.Files.createTempDirectory("graft_evo").toString
    Sinks.mergeSnapshot(
      Seq((1L, 1L, "a1")).toDF("k", "ver", "p"), root, Seq("k"), "ver", 0L)
    // batch 2 carries a NEW column `q`; batch 3 goes back to NOT
    // sending `p` — both directions must commit
    Sinks.mergeSnapshot(
      Seq((2L, 2L, "b2", 7L)).toDF("k", "ver", "p", "q"), root, Seq("k"), "ver", 1L)
    Sinks.mergeSnapshot(
      Seq((3L, 3L, 9L)).toDF("k", "ver", "q"), root, Seq("k"), "ver", 2L)
    val latest = Sinks.readLatestSnapshot(spark, root)
    assert(latest.columns.toSet === Set("k", "ver", "p", "q"),
      "union schema is the table schema")
    val rows = latest.collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getAs[Any]("p")), Option(r.getAs[Any]("q"))))).toMap
    assert(rows === Map(
      1L -> ((Some("a1"), None)),     // pre-evolution row: q is NULL
      2L -> ((Some("b2"), Some(7L))),
      3L -> ((None, Some(9L)))))      // column withheld later: p is NULL
    // time travel still reads the OLD schema for old versions
    assert(Sinks.readSnapshot(spark, root, 0L).columns.toSet === Set("k", "ver", "p"))
  }

  test("casMergeSnapshot: versions serialize, conflicts retry on top of the winner") {
    val root = java.nio.file.Files.createTempDirectory("graft_cas").toString
    // sequential commits claim consecutive versions
    val v0 = Sinks.casMergeSnapshot(
      Seq((1L, 1L, "a1")).toDF("k", "ver", "p"), root, Seq("k"), "ver")
    val v1 = Sinks.casMergeSnapshot(
      Seq((2L, 1L, "b1")).toDF("k", "ver", "p"), root, Seq("k"), "ver")
    assert((v0, v1) === (0L, 1L))
    // conflict primitive: claiming an already-committed version fails
    // and cleans up its stage
    val stage = s"$root/.stage-test"
    Seq((9L, 9L, "x")).toDF("k", "ver", "p").write.parquet(stage)
    assert(!Sinks.claimVersion(root, stage, 1L))
    assert(!new java.io.File(stage).exists(), "lost stage must be discarded")
    // concurrent committers: both succeed at DISTINCT versions and the
    // final snapshot carries BOTH deltas (the loser re-merged on top of
    // the winner — no lost update)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fa = Future(Sinks.casMergeSnapshot(
      Seq((3L, 2L, "c2")).toDF("k", "ver", "p"), root, Seq("k"), "ver"))
    val fb = Future(Sinks.casMergeSnapshot(
      Seq((4L, 2L, "d2")).toDF("k", "ver", "p"), root, Seq("k"), "ver"))
    val (va, vb) = (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
    assert(Set(va, vb) === Set(2L, 3L), s"got versions $va/$vb")
    val latest = Sinks.readLatestSnapshot(spark, root)
      .select("k", "p").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(latest === Map(1L -> "a1", 2L -> "b1", 3L -> "c2", 4L -> "d2"))
  }

  test("retentionPlan + vacuumSnapshots: keep-last-N expires history, loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft_vac").toString
    (0 to 2).foreach { v =>
      Seq((1L, v.toLong)).toDF("k", "v").write.parquet(s"$root/v$v")
    }
    val plan = Sinks.retentionPlan(spark, root, keepLast = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(plan === Map(0L -> (1L, true), 1L -> (1L, false), 2L -> (1L, false)))
    assert(Sinks.vacuumSnapshots(spark, root, keepLast = 2) === Seq(0L))
    assert(Sinks.snapshotVersions(root) === Seq(1L, 2L))
    // pre-history reads now fail loudly; surviving versions stay readable
    intercept[RuntimeException](Sinks.readSnapshot(spark, root, 0L).collect())
    assert(Sinks.readSnapshot(spark, root, 1L).count() === 1L)
    // idempotent: nothing left to expire
    assert(Sinks.vacuumSnapshots(spark, root, keepLast = 2) === Seq.empty)
  }

  test("compactSnapshot: file count drops to byte-target, reads identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/snap"
    (1 to 20000).map(i => (i.toLong, s"payload_$i"))
      .toDF("k", "payload").repartition(64) // the small-file pathology
      .write.parquet(dir)
    def files() = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val nBefore = files().length
    assert(nBefore === 64)
    val total = files().map(_.length).sum
    val (b, a) = Sinks.compactSnapshot(spark, dir, targetFileBytes = total / 4 + 1)
    assert(b === 64 && a === 4)
    assert(files().length === 4)
    val after = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    assert(after === before)
    // idempotent: already at target => no-op
    assert(Sinks.compactSnapshot(spark, dir, targetFileBytes = total / 4 + 1) === (4, 4))
  }

  test("compactSnapshot with sortCols re-clusters for row-group skipping") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_s").toString + "/snap"
    (1 to 10000).map(i => ((i * 2654435761L) % 9973, i))
      .toDF("k", "v").repartition(32)
      .write.parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val (b, a) = Sinks.compactSnapshot(spark, dir, targetFileBytes = Long.MaxValue, sortCols = Seq("k"))
    assert(b === 32 && a === 1)
    val perFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .withColumn("prev", lag("k", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f").orderBy(
          monotonically_increasing_id())))
    assert(perFile.filter(col("prev") > col("k")).count() === 0L)
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet === before)
  }
}
