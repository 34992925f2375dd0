package graft

import org.apache.spark.sql.functions._

/** Invariants for the eighteenth wave (q209-q212): a plain-JVM mirror
  * of the whole second-stage retrieval chain — ordered-fold cosine,
  * MaxSim over 4×16 sub-vectors, reciprocal top-3, rank-ordered
  * Rocchio centroids, majority votes — recomputed from the raw
  * embeddings, plus the structural facts (reciprocity, vote totals).
  */
class Training18Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Ordered left fold mirroring the engine's aggregate() expression. */
  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / (math.sqrt(a.foldLeft(0.0)((m, n) => m + n * n)) *
      math.sqrt(b.foldLeft(0.0)((u, w) => u + w * w)))

  private lazy val emb: Array[(Long, Seq[Double], Int)] =
    Tables(spark, dir, "embeddings").collect().map { r =>
      (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toSeq,
        r.getInt(2))
    }

  /** JVM mirror of Similarity.bruteForceTopK (round-4 scores, id ties). */
  private def topK(queryIds: Long => Boolean, k: Int): Map[Long, Seq[(Long, Double, Int)]] =
    emb.filter(e => queryIds(e._1)).map { case (qid, qv, _) =>
      qid -> emb.filter(_._1 != qid)
        .map { case (cid, cv, _) => (cid, round4(cos(qv, cv))) }
        .sortBy { case (cid, s) => (-s, cid) }.take(k).toSeq
        .zipWithIndex.map { case ((cid, s), i) => (cid, s, i + 1) }
    }.toMap

  test("q209: MaxSim equals the JVM 4x16 sub-vector mirror") {
    val subs = emb.map { case (id, v, _) =>
      id -> v.grouped(16).toSeq
    }.toMap
    val want = emb.filter(_._1 < 10).flatMap { case (qid, _, _) =>
      val scored = emb.filter(_._1 != qid).map { case (cid, _, _) =>
        val s = subs(qid).map(qs => subs(cid).map(cs => cos(qs, cs)).max)
          .foldLeft(0.0)(_ + _)
        (cid, round4(s))
      }
      scored.sortBy { case (cid, s) => (-s, cid) }.take(3).toSeq
        .zipWithIndex.map { case ((cid, s), i) => (qid, cid, s, i + 1) }
    }.toSet
    val got = q("q209_maxsim_late_interaction").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Double]("maxsim"), r.getAs[Int]("rnk"))).toSet
    assert(got == want)
  }

  test("q210: mutual pairs equal the reciprocal filter over the JVM top-3") {
    val top = topK(_ => true, 3)
    val want = (for {
      (a, nbrs) <- top.iterator
      (b, s, rab) <- nbrs
      if a < b
      rba <- top(b).collectFirst { case (c, _, r) if c == a => r }
    } yield (a, b, s, rab, rba)).toSet
    val got = q("q210_mutual_knn").collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rank_ab"),
        r.getAs[Int]("rank_ba"))).toSet
    assert(got == want)
    // reciprocity is symmetric: every emitted pair's reverse rank ≤ 3
    got.foreach { case (_, _, _, rab, rba) =>
      assert(rab <= 3 && rba <= 3)
    }
  }

  test("q211: Rocchio rerank equals the JVM rank-ordered centroid mirror") {
    val vecOf = emb.map(e => e._1 -> e._2).toMap
    val top = topK(_ < 10, 3)
    val want = top.toSeq.flatMap { case (qid, nbrs) =>
      val vs = nbrs.sortBy(_._3).map(n => vecOf(n._1))
      val cvec = (0 until 64).map(d =>
        ((vs(0)(d) + vs(1)(d)) + vs(2)(d)) / 3.0)
      emb.filter(_._1 != qid)
        .map { case (cid, cv, _) => (cid, round4(cos(cvec, cv))) }
        .sortBy { case (cid, s) => (-s, cid) }.take(5).toSeq
        .zipWithIndex.map { case ((cid, s), i) => (qid, cid, s, i + 1) }
    }.toSet
    val got = q("q211_rocchio_rerank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rnk"))).toSet
    assert(got == want)
  }

  test("q212: label audit equals JVM majority votes; totals conserve") {
    val labelOf = emb.map(e => e._1 -> e._3).toMap
    val top = topK(_ => true, 3)
    val preds = top.map { case (qid, nbrs) =>
      val counts = nbrs.groupBy(n => labelOf(n._1))
        .view.mapValues(_.size).toMap
      val best = counts.values.max
      qid -> counts.filter(_._2 == best).keys.min
    }
    val want = preds.toSeq.groupBy(p => labelOf(p._1)).map { case (l, g) =>
      l -> ((g.size.toLong, g.count(p => p._2 == l).toLong))
    }
    val got = q("q212_knn_label_audit").collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_correct")))).toMap
    assert(got == want)
    assert(got.values.map(_._1).sum == emb.length.toLong)
  }
}
