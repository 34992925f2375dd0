package graft.sources

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Storage-layout strategies for the 100 TB design: bucketed tables
  * that co-locate fact-fact joins (zero shuffle) and partitioned
  * layouts whose partition filters prune at the file index. Proven
  * here end-to-end, not just claimed in docs.
  */
class SourcesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables co-locate the join: no exchange in the plan") {
    Tables(spark, dir, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_li_bucketed")
    Tables(spark, dir, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_o_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle-family join
      val joined = spark.table("graft_li_bucketed")
        .join(spark.table("graft_o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(plan.contains("SortMergeJoin"), plan)
      // the join itself introduces no exchanges: bucket layout already
      // partitions both sides on the key (the only exchange is the
      // post-join single aggregation)
      val joinSection = plan.split("SortMergeJoin").last
      assert(!joinSection.contains("Exchange"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_o_bucketed")
    }
  }

  test("partitioned parquet layout prunes partitions at the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables(spark, dir, "lineitem")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val filtered = spark.read.parquet(out).filter(col("l_returnflag") === "A")
    val p = filtered.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters"), p)
    assert("""\(l_returnflag#\d+ = A\)""".r.findFirstIn(p).isDefined, p)
    val expected = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "A").count()
    assert(filtered.count() === expected)
  }

  test("schema evolution: mergeSchema unifies batches, old rows null-fill new columns") {
    // the lake reality at 100 TB: years of batches, schema widened along
    // the way — a reader must see one unified schema with nulls where a
    // batch predates a column, and per-file pruning must still work
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(out)
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "v", "score")
      .write.mode("append").parquet(out)
    val unified = spark.read.option("mergeSchema", "true").parquet(out)
    assert(unified.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = unified.orderBy("id").collect()
    assert(rows.length == 4)
    assert(rows.take(2).forall(_.isNullAt(rows(0).fieldIndex("score"))))
    assert(rows(2).getAs[Double]("score") == 30.0)
    // filters on the NEW column still push into the scan
    val p = unified.filter(col("score") > 35.0).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters: [IsNotNull(score), GreaterThan(score"), p)
  }
}
