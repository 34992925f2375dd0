package graft

import org.apache.spark.sql.functions._

/** Invariants for the seventy-third wave:
  *
  *  - q385: the persisted merged snapshot re-derives row-for-row from
  *    a JVM three-way merge, conflicts are exactly the doubly-edited
  *    keys, and branch snapshots remain readable (no history rewrite);
  *  - q386: both generation scans carry partition filters on their OWN
  *    layout (month dirs pruned on gen0, day dirs on gen1);
  *  - q387: per-user match counts re-derive via an independent JVM
  *    scan (hand-rolled matcher, not a regex), including a crafted
  *    overlap/greediness fixture.
  */
class Training73Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q385: merged snapshot re-derives via JVM three-way merge; branches intact") {
    val census = q("q385_branch_merge_three_way").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val base = Tables(spark, dir, "orders").selectExpr("o_orderkey",
      "CAST(round(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = base.map { case (k, c) =>
      val a = if (k % 7 == 0) Some(c * 2) else None
      val b = if (k % 5 == 0) Some(c + 1000) else None
      val outcome = (a, b) match {
        case (Some(_), Some(_)) => "conflict_a_wins"
        case (Some(_), None) => "a_only"
        case (None, Some(_)) => "b_only"
        case _ => "unchanged"
      }
      (outcome, a.orElse(b).getOrElse(c))
    }.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    assert(census === want)
    assert(census.keySet === Set("conflict_a_wins", "a_only", "b_only",
      "unchanged"), "all four outcome classes must occur")
    // branch snapshots are still readable and unrewritten
    val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_branch_${Integer.toHexString(dir.hashCode)}").toString
    val aSum = spark.read.parquet(s"$root/branchA")
      .agg(sum("cents")).head().getLong(0)
    val wantASum = base.map { case (k, c) =>
      if (k % 7 == 0) c * 2 else c }.sum
    assert(aSum === wantASum, "branch A history must be intact post-merge")
  }

  test("q386: both generations prune on their own partition layout") {
    q("q386_partition_evolution").collect() // stage the generations
    // derive the staging root EXACTLY as the query does (Stage.key —
    // content-fingerprinted since the staleness-proof key generalization;
    // the old dir.hashCode derivation silently diverged from it)
    val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_pspec_${graft.Stage.key(dir, "events")}").toString
    val g0 = spark.read.parquet(s"$root/gen0")
      .filter(col("month") === "2024-01")
      .filter(col("day").between("2024-01-10", "2024-01-20"))
    val g1 = spark.read.parquet(s"$root/gen1")
      .filter(col("day").between("2024-01-10", "2024-01-20"))
    val p0 = g0.queryExecution.executedPlan.toString
    val p1 = g1.queryExecution.executedPlan.toString
    assert(p0.contains("PartitionFilters: [isnotnull(month") ||
      p0.contains("PartitionFilters: [(month"),
      s"gen0 must prune month dirs:\n${p0.take(800)}")
    assert(p1.contains("PartitionFilters: [isnotnull(day") ||
      p1.contains("PartitionFilters: [(day"),
      s"gen1 must prune day dirs:\n${p1.take(800)}")
    // and the generations really use different specs on disk
    val dirs0 = new java.io.File(s"$root/gen0").list().filter(_.contains("="))
    val dirs1 = new java.io.File(s"$root/gen1").list().filter(_.contains("="))
    assert(dirs0.nonEmpty && dirs0.forall(_.startsWith("month=")))
    assert(dirs1.nonEmpty && dirs1.forall(_.startsWith("day=")))
  }

  test("q387: match counts re-derive via a hand-rolled (non-regex) scanner") {
    // independent matcher for v c+ p, greedy, non-overlapping
    def matches(seq: String): Long = {
      var i = 0; var n = 0L
      while (i < seq.length) {
        if (seq.charAt(i) == 'v') {
          var j = i + 1; var clicks = 0
          while (j < seq.length && seq.charAt(j) == 'c') { clicks += 1; j += 1 }
          if (clicks > 0 && j < seq.length && seq.charAt(j) == 'p') {
            n += 1; i = j + 1 // non-overlapping: resume after the match
          } else i += 1
        } else i += 1
      }
      n
    }
    assert(matches("vccp") === 1L && matches("vcpvcp") === 2L &&
      matches("vp") === 0L && matches("vcvcp") === 1L &&
      matches("vccpcp") === 1L)
    val rows = Tables(spark, dir, "events").selectExpr("user_id",
      "unix_micros(ts)", "event_id",
      """CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
         WHEN 'purchase' THEN 'p' ELSE 'e' END""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val want = rows.groupBy(_._1).view.mapValues { g =>
      matches(g.sortBy(r => (r._2, r._3)).map(_._4).mkString)
    }.toMap.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = q("q387_sequence_pattern").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.keySet.exists(_ > 0L), "some user must have a match")
  }
}
