package graft

import org.apache.spark.sql.functions._

/** Invariants for the sixty-ninth wave:
  *
  *  - q374: checkpoint recovery really is exactly-once — the recovered
  *    sink holds each key exactly once (restart neither replayed file0
  *    nor dropped file1), and the two halves both landed;
  *  - q375: the fact scan carries a dynamicpruning partition filter
  *    (DPP fired — the dim's runtime result prunes fact partitions),
  *    and only the hot partitions' rows are aggregated.
  */
class Training69Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q374: recovered sink has every key exactly once, both halves present") {
    val out = q("q374_stream_checkpoint_recovery").collect()
    val (n, nKeys) = (out.map(_.getLong(1)).sum, out.map(_.getLong(2)).sum)
    // n == n_keys summed per priority ⇒ no key duplicated (no replay);
    // equality with the batch census (the oracle) rules out loss. Here
    // re-assert the census directly against the orders table.
    val want = Tables(spark, dir, "orders").count()
    assert(n === want, "row census after recovery must equal batch census")
    assert(nKeys === want, "a replay would duplicate keys")
    // both halves (even and odd orderkeys) must be present in the sink:
    // the recovered second query contributed file1, the first file0.
    val stage = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_ckpt_${Integer.toHexString(dir.hashCode)}").toString
    val sink = spark.read.parquet(s"$stage/out")
    assert(sink.filter(col("k") % 2 === 0).count() > 0)
    assert(sink.filter(col("k") % 2 === 1).count() > 0)
    // and the checkpoint recorded exactly two committed batches (one
    // per query run) — a third would mean the restart re-planned file0.
    val commits = new java.io.File(s"$stage/checkpoint/commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits === 2, s"expected 2 committed batches, got $commits")
  }

  test("q375: fact scan is dynamically partition-pruned by the dim filter") {
    val df = q("q375_dynamic_partition_pruning")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "fact scan must carry a runtime dynamicpruning partition filter")
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("1-URGENT", "2-HIGH"))
    val want = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") < "3").count()
    assert(rows.map(_.getLong(1)).sum === want)
  }
}
