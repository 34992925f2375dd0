package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Invariants for the fifty-sixth wave (q336-q337): NDCG re-derived
  * per query from the two rankings (plus metric laws), and the
  * inclusion-exclusion gate checked against exact set arithmetic.
  */
class Training56Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q336: NDCG re-derives per query from the two rankings") {
    val r = q("q336_ndcg_eval").collect().head
    val (nq, meanNdcg, nPerfect) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("vec", expr("transform(embedding, x -> cast(x as double))"))
    val exact = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 20), emb, "vec_id", "vec", k = 3)
      .collect().map(row => (row.getLong(0), row.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Similarity.annTopK(emb, "vec_id", "vec", 64,
      queryFilter = col("vec_id") < 20, k = 3, tables = 2, planesPerTable = 4)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(3)))
    def hu(x: Long, n: Long): Long = (2 * x + n) / (2 * n)
    val weights = Map(1 -> 1000000L, 2 -> 630930L, 3 -> 500000L)
    val lshByQ = lsh.groupBy(_._1)
    val ndcgs = exact.keys.toSeq.map { qid =>
      val dcg = lshByQ.getOrElse(qid, Array.empty[(Long, Long, Int)]).collect {
        case (_, cand, rnk) if exact(qid).contains(cand) => weights(rnk)
      }.sum
      hu(1000000L * dcg, 2130930L)
    }
    assert(nq === ndcgs.size.toLong)
    assert(meanNdcg === hu(ndcgs.sum, ndcgs.size.toLong))
    assert(nPerfect === ndcgs.count(_ == 1000000L).toLong)
    // metric laws: bounded, and perfect iff the LSH top-3 IS the
    // exact top-3 in order-compatible positions
    assert(ndcgs.forall(v => v >= 0L && v <= 1000000L))
    assert(meanNdcg > 0L, "LSH must find SOME relevant neighbors")
  }

  test("q337: gate holds and exact witnesses recount") {
    val r = q("q337_hll_intersection").collect().head
    assert(r.getBoolean(2), "inclusion-exclusion gate must hold")
    val ev = Tables(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "user_id").collect()
      .map(row => (row.getString(0), row.getLong(1)))
    val a = ev.filter(_._1 == "click").map(_._2).toSet
    val b = ev.filter(_._1 == "purchase").map(_._2).toSet
    assert(r.getLong(0) === a.intersect(b).size.toLong)
    assert(r.getLong(1) === a.union(b).size.toLong)
  }
}
