package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** IVF ANN correctness: seed-pinned determinism and recall against the
  * exact brute-force baseline on the harness embeddings.
  */
class IvfAnnSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def emb = graft.Tables(spark, sfDir, "embeddings")
    .withColumn("vec", expr("transform(embedding, x -> cast(x as double))"))

  test("ivf top-k: deterministic across runs, recall vs brute force") {
    val queries = col("vec_id") < 20
    val exact = Similarity.bruteForceTopK(
      emb.filter(queries), emb, "vec_id", "vec", k = 3)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ivf1 = Similarity.ivfTopK(emb, "vec_id", "vec", queries, k = 3, nlist = 8, nprobe = 3)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf2 = Similarity.ivfTopK(emb, "vec_id", "vec", queries, k = 3, nlist = 8, nprobe = 3)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(ivf1 == ivf2, "seed-pinned IVF must be run-to-run deterministic")
    val recall = (exact intersect ivf1).size.toDouble / exact.size
    // probing 3 of 8 lists on random embeddings: recall is bounded away
    // from zero but not 1.0 — the accuracy/cost dial IVF exists to turn
    assert(recall >= 0.4, s"ivf recall@3 too low: $recall")
    assert(ivf1.nonEmpty)
  }
}
