package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Semantic invariants for the third training-data-prep wave (q105-q109),
  * checked on the harness tables (sf0.001) — properties, not pinned
  * values, so they hold at any SF.
  */
class Training3Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)
  private def docs = graft.Tables(spark, dir, "documents")

  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
  }

  test("q105 reassembles untouched docs verbatim and never grows a doc") {
    val out = q("q105_line_dedup")
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .cache()
    assert(out.filter(col("n_kept") > col("n_chunks")).count() === 0L)
    val full = out.filter(col("n_kept") === col("n_chunks"))
    assert(full.count() > 0L, "expected some fully-kept docs at sf0.001")
    assert(full.filter(col("clean_text") =!= col("text")).count() === 0L,
      "a fully-kept doc must reassemble to its original text")
    out.unpersist()
  }

  test("q106 is the exact JVM-computed weighted top-k") {
    val k = 100
    val expected = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, w) => (hash60(id.toString).toDouble / w, id) }
      .take(k).map(_._1).toSet
    val got = q("q106_weighted_sample").collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("q107 matches Spark's built-in corr within cents-rounding error") {
    val li = graft.Tables(spark, dir, "lineitem")
    val got = q("q107_corr_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size === 6)
    got.foreach { case ((a, b), r) =>
      assert(r >= -1.0 && r <= 1.0, s"corr($a,$b)=$r out of range")
      val ref = li.agg(corr(col(a), col(b))).head.getDouble(0)
      assert(math.abs(r - ref) < 1e-3, s"corr($a,$b)=$r but Spark corr=$ref")
    }
  }

  test("q108 codes are valid and subspace 0 equals a direct fit") {
    val out = q("q108_pq_codes").cache()
    assert(out.count() === graft.Tables(spark, dir, "embeddings").count())
    (0 until 4).foreach { i =>
      assert(out.filter(col(s"c$i") < 0 || col(s"c$i") > 7).count() === 0L)
    }
    val direct = DeterministicKMeans.assignments(
      graft.Tables(spark, dir, "embeddings")
        .select(col("vec_id"), expr("slice(embedding, 1, 16)").as("sub")),
      "vec_id", "sub", k = 8, iters = 2)
    val joined = out.select(col("vec_id"), col("c0"))
      .join(direct, "vec_id")
    assert(joined.filter(col("c0") =!= col("cluster")).count() === 0L)
    out.unpersist()
  }

  test("q110 matches an independent JVM BPE trainer") {
    // reference implementation: same spec, no Spark, no SQL
    var vocab: Map[List[String], Long] = docs.select("text").collect()
      .flatMap(_.getString(0).split(" "))
      .groupBy(identity).map { case (w, xs) =>
        w.toList.map(_.toString) -> xs.length.toLong
      }
    val expected = (1 to 3).map { step =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (toks, f) =>
        toks.sliding(2).foreach {
          case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      val ((pa, pb), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      def merge(ts: List[String]): List[String] = ts match {
        case a :: b :: rest if a == pa && b == pb => (pa + pb) :: merge(rest)
        case a :: rest => a :: merge(rest)
        case Nil => Nil
      }
      vocab = vocab.map { case (toks, f) => merge(toks) -> f }
      (step, pa, pb, cnt)
    }
    val got = q("q110_bpe_merges").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("q112 IVF-PQ: 3 per query, no self-match, candidates from probed lists only") {
    val out = q("q112_ivf_pq_ann").cache()
    val perQuery = out.groupBy("query_id").agg(count(lit(1)).as("n")).collect()
    assert(perQuery.length === 3 && perQuery.forall(_.getLong(1) === 3L))
    assert(out.filter(col("query_id") === col("cand_id")).count() === 0L)
    // every candidate must live in one of its query's 2 nearest coarse lists
    val emb = graft.Tables(spark, dir, "embeddings")
    val (cents, assign) = DeterministicKMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val micro = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000000, 0) as bigint))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val probed = micro.map { case (qid, qv) =>
      qid -> cents.zipWithIndex.map { case (c, i) => (sq(qv, c), i) }
        .sorted.take(2).map(_._2.toLong).toSet
    }
    val clusters = assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.collect().foreach { r =>
      val (qid, cand) = (r.getLong(0), r.getLong(1))
      assert(probed(qid).contains(clusters(cand)),
        s"candidate $cand of query $qid not in probed lists ${probed(qid)}")
    }
    out.unpersist()
  }

  test("q113 splits partition the corpus and stay stable under growth") {
    val out = q("q113_dataset_split").collect()
    assert(out.map(_.getLong(2)).sum === docs.count())
    // stability: a doc's split never depends on the rest of the corpus —
    // recompute for a half-corpus and check agreement on the overlap
    val h = expr(graft.operators.TextOps.hash60Spark("cast(doc_id as string)"))
    val splitCol = when(h % 10 < 8, lit("train"))
      .when(h % 10 < 9, lit("valid")).otherwise(lit("test"))
    val full = docs.select(col("doc_id"), splitCol.as("s1"))
    val half = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), splitCol.as("s2"))
    assert(full.join(half, "doc_id").filter(col("s1") =!= col("s2")).count() === 0L)
  }

  test("q114 manifest respects its gates and conserves represented mass") {
    val rows = q("q114_training_manifest").collect()
    val weighted = Set("en", "de", "es", "fr", "zh")
    rows.foreach { r =>
      assert(Set("train", "valid", "test").contains(r.getString(0)))
      assert(weighted.contains(r.getString(1)), "unweighted lang must be filtered out")
      assert(r.getLong(3) >= r.getLong(2), "n_represented >= n_docs (dedup mass)")
    }
    assert(rows.map(_.getLong(2)).sum <= docs.count())
  }

  test("q109 gives isolated docs the base rank and nobody less") {
    val ranks = q("q109_pagerank").cache()
    assert(ranks.count() === docs.count())
    assert(ranks.filter(col("r") < 150000L).count() === 0L)
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashBands(docs, "doc_id", "text"), "doc_id")
    val touched = pairs.select(col("doc_id_a").as("doc_id"))
      .union(pairs.select(col("doc_id_b").as("doc_id"))).distinct()
    val isolated = ranks.join(touched, Seq("doc_id"), "left_anti")
    assert(isolated.filter(col("r") =!= 150000L).count() === 0L,
      "an isolated doc must keep the teleport-only rank")
    ranks.unpersist()
  }
}
