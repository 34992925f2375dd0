package graft

import org.apache.spark.sql.functions._

/** Invariants for the seventy-fifth wave:
  *
  *  - q391: both strategies re-derive from a JVM cosine replica
  *    (same fused-loop accumulation order as the codegen expression),
  *    and post-filter survivors are structurally a PREFIX of the
  *    pre-filter ranking (overlap == post_found always);
  *  - q392: the scan reads only the buckets the IN predicate hashes
  *    to (SelectedBucketsCount pinned);
  *  - q393: speed-layer + batch-layer merge equals the one-pass batch
  *    census (the lambda invariant), and the speed layer really ran
  *    as multiple microbatches.
  */
class Training75Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q391: JVM replica of both strategies; post is a prefix of pre") {
    val emb = Tables(spark, dir, "embeddings").collect().map { r =>
      (r.getAs[Number]("vec_id").longValue(),
        r.getAs[Number]("label").intValue(),
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(_.toDouble).toArray)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val queries = emb.filter(_._1 % 100 == 0)
    var preTot = 0L; var postTot = 0L; var overlapTot = 0L
    queries.foreach { case (qid, ql, qv) =>
      val ranked = emb.filter(_._1 != qid)
        .map { case (cid, cl, cv) => (cid, cl, r4(cos(qv, cv))) }
        .sortBy { case (cid, _, s) => (-s, cid) }
      val pre = ranked.filter(_._2 == ql).take(5).map(_._1).toSet
      val post = ranked.take(20).filter(_._2 == ql).take(5).map(_._1).toSet
      preTot += pre.size; postTot += post.size
      overlapTot += pre.intersect(post).size
      assert(post.subsetOf(pre),
        s"post-filter survivors must be a prefix of the pre ranking ($qid)")
    }
    val r = q("q391_filtered_knn").collect().head
    assert(r.getLong(0) === queries.length.toLong)
    assert(r.getLong(1) === preTot && r.getLong(2) === postTot &&
      r.getLong(3) === overlapTot)
    assert(r.getLong(3) === r.getLong(2), "overlap == post_found (prefix)")
  }

  test("q392: the scan reads only the selected buckets") {
    // the DECLARED plan (groupBy on the bucket key gives the planner a
    // reason to keep the bucketed scan; a bare filter+count would be
    // demoted by autoBucketedScan)
    val scan = q("q392_bucket_pruning")
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of 16".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"bucket pruning must appear:\n${plan.take(800)}")
    assert(m.get.group(1).toInt <= 3, "at most one bucket per key")
    // and the pruned read returns exactly the full-scan census
    val want = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey").isin(7L, 19L, 23L)).count()
    assert(scan.collect().map(_.getLong(1)).sum === want)
  }

  test("q393: speed + batch == batch-over-everything; >1 microbatch ran") {
    val got = q("q393_lambda_reconciliation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Tables(spark, dir, "events")
      .selectExpr("event_type", "CAST(round(value * 100, 0) AS BIGINT) AS c")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    // the tail was staged as 2 files with maxFilesPerTrigger=1 → the
    // stream committed ≥2 batches
    val stage = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_lambda_${Integer.toHexString(dir.hashCode)}").toString
    val tailFiles = new java.io.File(s"$stage/tail").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(tailFiles >= 2, "speed layer must have processed >=2 files")
  }
}
