package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic checks for the near-dup family on planted duplicates (the
  * harness corpus is all-distinct random text, so the declared queries
  * only pin determinism; this pins *detection*).
  */
class NearDupSpec extends SparkSpec {
  import spark.implicits._
  import TextOps._

  private val base = (1 to 60).map(i => s"word$i").mkString(" ")
  private val oneEdit = base.replace("word30", "changed")
  private val reordered = base.split(' ').reverse.mkString(" ")
  private val different = (1 to 60).map(i => s"other$i").mkString(" ")

  private lazy val docs = Seq(
    (0L, base), (1L, base), (2L, oneEdit), (3L, different), (4L, reordered)
  ).toDF("doc_id", "text")
    .withColumn("wh", expr(wordHashesSpark()))
    .withColumn("hh", expr(ngramHashesSpark(3, "wh")))
    .cache()

  test("minhash-LSH bands: exact copy always pairs; one-edit doc shares a band") {
    val sig = docs.select(
      (col("doc_id") +: (0 until 4).map(b => expr(bandSpark(b, 2, "hh")).as(s"band$b"))): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    assert(sig(0L) === sig(1L), "identical docs have identical signatures")
    assert(sig(0L).zip(sig(2L)).exists { case (a, b) => a == b },
      "one edit in 60 words leaves at least one of 4 bands intact")
    assert(!sig(0L).zip(sig(3L)).exists { case (a, b) => a == b },
      "unrelated docs share no band")
  }

  test("3-gram jaccard ranks: copy=1 > one-edit > reorder > disjoint") {
    def j(a: Long, b: Long): Double = {
      val r = docs.as("x").join(docs.as("y"),
        col("x.doc_id") === a && col("y.doc_id") === b)
        .select(expr(jaccardSpark("x.hh", "y.hh")))
        .head
      r.getDouble(0)
    }
    assert(j(0L, 1L) === 1.0)
    assert(j(0L, 2L) > 0.8, "one edit of 60 words: most 3-gram shingles survive")
    assert(j(0L, 2L) < 1.0)
    assert(j(0L, 4L) < j(0L, 2L), "full reorder destroys most 3-grams")
    assert(j(0L, 3L) === 0.0)
  }

  test("dedupe end-to-end: exact copies collapse, near-dups cluster, mass conserved") {
    val raw = Seq(
      (0L, base), (1L, base), (2L, oneEdit), (3L, different), (4L, reordered)
    ).toDF("doc_id", "text")
    val out = Dedup.dedupe(raw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.sum === 5L, "every raw doc represented exactly once")
    assert(!out.contains(1L), "exact copy never survives")
    assert(!out.contains(2L), "one-edit near-dup folds into doc 0's cluster")
    assert(out(0L) >= 3L, "doc 0 represents itself, its copy, and the near-dup")
    assert(out.contains(3L), "unrelated doc survives alone")
  }

  test("dedupe default clustering collapses a deep near-dup CHAIN in O(log n) rounds") {
    // sliding-window corpus: doc_i ≈ doc_{i+1} (jaccard ≈ 0.95) but
    // doc_0 and doc_99 share nothing — a 100-hop chain. The default
    // connectedComponentsStar closes it in ~log n rounds; min-label
    // propagation would need ~99 (past its maxIter), which is exactly
    // why star is the composed pipeline's default.
    val words = (0 until 150).map(i => s"w${i}x")
    val chain = (0 until 100).map(i =>
      (i.toLong, words.slice(i, i + 40).mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.dedupe(chain, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 100L),
      s"chain must collapse to ONE survivor representing all 100 docs, got $out")
  }

  test("dedupe: star and propagation clustering produce identical output on shallow graphs") {
    val raw = Seq(
      (0L, base), (1L, base), (2L, oneEdit), (3L, different), (4L, reordered)
    ).toDF("doc_id", "text")
    val star = Dedup.dedupe(raw, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val prop = Dedup.dedupe(raw, "doc_id", "text",
      components = Dedup.connectedComponents(_, _, _))
      .collect().map(_.toSeq).toSet
    assert(star === prop)
  }

  test("simhash: hamming distance orders near-dup < unrelated") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val sh = docs
      .select(col("doc_id"), expr(simhashSpark("wh", 16)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hamming(sh(0L), sh(1L)) === 0)
    assert(hamming(sh(0L), sh(2L)) <= 4, "one-word edit moves few bits")
    assert(hamming(sh(0L), sh(2L)) < hamming(sh(0L), sh(3L)),
      "near-dup closer than unrelated doc")
  }
}
