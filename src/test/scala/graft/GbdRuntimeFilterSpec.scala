package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Runtime (join-driven) block pruning on the gbd DSv2 connector:
  * the optimizer plants a dynamicpruning subquery on the scan, the
  * runtime hands it the manifest's doc_id set, and the scan re-plans to
  * only the blocks whose (minId, maxId) range intersects it.
  */
class GbdRuntimeFilterSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q468: dynamicpruning in plan; blocks drop at runtime; result matches plain join") {
    val df = SparkEntry.allDefs.find(_.name == "q468_gbd_runtime_prune").get.fn(spark, dir)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("dynamicpruning"), s"no runtime filter planted:\n$plan")

    graft.sources.GbdScan.lastRuntime = None
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // the scan observed the runtime In-set and kept a strict subset
    val staged = graft.sources.GbdFormat.stageDocuments(spark, dir, blockRecords = 64)
    val totalBlocks = graft.sources.GbdFormat.shardsOf(staged)
      .map(p => graft.sources.GbdFormat.readIndex(p).length).sum
    val rt = graft.sources.GbdScan.lastRuntime
    assert(rt.isDefined, "runtime filter() was never invoked")
    val (nIds, kept) = rt.get
    assert(nIds > 0)
    assert(kept < totalBlocks, s"runtime prune kept $kept of $totalBlocks blocks")

    // semantic identity vs the plain parquet-side computation
    val want = Tables(spark, dir, "documents")
      .filter(expr("doc_id div 64 IN (1, 5)"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(length(col("text")).cast("long")).as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }
}
