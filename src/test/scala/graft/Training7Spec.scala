package graft

import org.apache.spark.sql.functions._

/** Invariants for the seventh wave (q147-q150) beyond the row/hash
  * oracle: RRF scores must be exactly the rank-derived sum (not just
  * hash-stable), PSI must be non-negative and non-vacuous, hard
  * negatives must genuinely contrast labels, and PMI must be internally
  * consistent with independently recomputed counts.
  */
class Training7Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q147: rrf_micro is exactly the truncated-harmonic sum of the two ranks") {
    val rows = q("q147_rrf_fusion").collect()
    assert(rows.length == 15) // 3 queries x top-5
    rows.foreach { r =>
      def contrib(c: String): Long =
        if (r.isNullAt(r.fieldIndex(c))) 0L else 1000000L / (60L + r.getAs[Long](c))
      assert(r.getAs[Long]("rrf_micro") == contrib("lex_rank") + contrib("vec_rank"))
      assert(r.getAs[Long]("fused_rank") >= 1 && r.getAs[Long]("fused_rank") <= 5)
    }
    // non-vacuous fusion: at least one fused hit must carry BOTH ranks
    // (a doc retrieved by the lexical AND the vector list)
    assert(rows.exists(r =>
      !r.isNullAt(r.fieldIndex("lex_rank")) && !r.isNullAt(r.fieldIndex("vec_rank"))))
    // within each query the fused ranking is monotone in rrf_micro
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Long]("fused_rank")).map(_.getAs[Long]("rrf_micro"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q148: PSI is non-negative, non-vacuous, and stable across runs") {
    val r1 = q("q148_psi_drift").collect()
    assert(r1.length == 1)
    assert(r1.head.getAs[Long]("n_r") > 0 && r1.head.getAs[Long]("n_a") > 0)
    // each PSI term is (p-q)ln(p/q) >= 0, so the sum must be too
    assert(r1.head.getAs[Long]("psi_ppm") >= 0)
    val r2 = q("q148_psi_drift").collect()
    assert(r1.head == r2.head)
  }

  test("q149: every hard negative carries a different label than its query") {
    val rows = q("q149_hard_negatives")
    val emb = Tables(spark, dir, "embeddings").select("vec_id", "label")
    val joined = rows
      .join(emb.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "ql"), "query_id")
      .join(emb.withColumnRenamed("vec_id", "cand_id")
        .withColumnRenamed("label", "cl"), "cand_id")
    assert(joined.filter(col("ql") === col("cl")).count() == 0)
    val perQuery = rows.groupBy("query_id").count().collect()
    assert(perQuery.forall(_.getAs[Long]("count") == 3))
    assert(rows.filter(col("cos_sim") < -1.0001 || col("cos_sim") > 1.0001).count() == 0)
  }

  test("q150: PMI rows are ordered, thresholded, and match a JVM recount") {
    val rows = q("q150_pmi_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("w1") < r.getAs[String]("w2"))
      assert(r.getAs[Long]("c12") >= 5)
    }
    val pmis = rows.map(_.getAs[Long]("pmi_micro"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    // independent recount of the top pair's PMI from raw text
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ").filter(_.nonEmpty).toSet)
    val top = rows.head
    val (w1, w2) = (top.getAs[String]("w1"), top.getAs[String]("w2"))
    val n = docs.length.toDouble
    val c1 = docs.count(_._2.contains(w1)).toDouble
    val c2 = docs.count(_._2.contains(w2)).toDouble
    val c12 = docs.count(d => d._2.contains(w1) && d._2.contains(w2)).toDouble
    assert(c12 == top.getAs[Long]("c12").toDouble)
    val expected = math.round(math.log((c12 * n) / (c1 * c2)) * 1000000)
    assert(expected == top.getAs[Long]("pmi_micro"))
  }
}
