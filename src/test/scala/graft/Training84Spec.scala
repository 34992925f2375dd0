package graft

import org.apache.spark.sql.functions._

/** Invariants for the eighty-fourth wave:
  *
  *  - q416: dynamic-gap sessions re-derive via a JVM interval-merge
  *    sweep (independent of both the native session_window and the
  *    oracle's islands SQL), including a crafted boundary fixture
  *    (event exactly at session end starts a NEW session);
  *  - q417: the audit survives a clean store (0 orphans) and finds
  *    exactly the planted leftover on the dirty one;
  *  - q418: the four predicate families re-derive by JVM string ops.
  */
class Training84Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q416: JVM interval-merge sweep re-derives the census; boundary exact") {
    def sessions(evs: Seq[(Long, Long)]): Int = { // (ts_us, gap_us)
      var n = 0; var end = Long.MinValue
      evs.sortBy(_._1).foreach { case (ts, gap) =>
        if (ts >= end) { n += 1; end = ts + gap }
        else end = math.max(end, ts + gap)
      }
      n
    }
    // boundary fixture: second event exactly at the first session's
    // end must START A NEW session ([start, end) exclusivity)
    assert(sessions(Seq((0L, 100L), (100L, 100L))) === 2)
    assert(sessions(Seq((0L, 100L), (99L, 100L))) === 1)
    val rows = Tables(spark, dir, "events").selectExpr("user_id",
      "unix_micros(ts)",
      "CASE WHEN event_type = 'view' THEN 1800000000L ELSE 300000000L END")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perUser = rows.groupBy(_._1).view
      .mapValues(g => sessions(g.map(r => (r._2, r._3)))).toMap
    val want = perUser.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = q("q416_dynamic_gap_sessions").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.keySet.exists(_ > 1L), "multi-session users must exist")
  }

  test("q417: clean store has 0 orphans; dirty store finds the plant") {
    val got = q("q417_orphan_file_audit").collect().head
    assert(got.getLong(0) === 4L && got.getLong(1) === 1L &&
      got.getBoolean(2))
    // clean re-audit: remove the orphan, re-run the anti-join directly
    val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_orphan_${Integer.toHexString(dir.hashCode)}").toString
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      s"$root/data/part-ORPHAN.leftover.parquet"))
    import spark.implicits._
    val onDisk = new java.io.File(s"$root/data").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSeq.toDF("file")
    val orphans = onDisk.join(
      spark.read.parquet(s"$root/manifest"), Seq("file"), "left_anti")
    assert(orphans.count() === 0L, "clean store must audit clean")
  }

  test("q418: predicate families re-derive by JVM string ops") {
    val names = Tables(spark, dir, "part")
      .select("p_name").collect().map(_.getString(0))
    val r = q("q418_pattern_predicates").collect().head
    assert(r.getLong(0) ===
      names.count(n => n.contains("red") || n.contains("blue")).toLong)
    assert(r.getLong(1) ===
      names.count(n => !n.contains("red") && !n.contains("blue")).toLong)
    assert(r.getLong(2) ===
      names.count(_.toUpperCase.contains("GREEN")).toLong)
    assert(r.getLong(3) ===
      names.count(n => n.nonEmpty && n.head >= 'a' && n.head <= 'f').toLong)
    assert(r.getLong(4) === names.length.toLong)
    assert(r.getLong(0) + r.getLong(1) === r.getLong(4),
      "LIKE ANY and NOT LIKE ALL must partition the table")
  }
}
