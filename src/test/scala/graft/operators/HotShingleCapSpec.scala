package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted hot-shingle / hot-bucket scale guards: a power-law corpus has
  * shingles (stop-phrases, boilerplate) shared by an unbounded share of
  * documents, and a shingle in k docs contributes k² rows to any
  * candidate self-join. These tests plant exactly that pathology and
  * prove the df/bucket caps keep candidate generation bounded, while an
  * uncapped run explodes quadratically — and that the caps change
  * nothing when no shingle is hot.
  */
class HotShingleCapSpec extends SparkSpec {
  import spark.implicits._

  private val N = 300

  /** every doc shares the one 3-gram "hot1 hot2 hot3"; tails unique */
  private lazy val hotCorpus = (1 to N).map { i =>
    (i.toLong, s"hot1 hot2 hot3 u${i}a u${i}b u${i}c u${i}d u${i}e")
  }.toDF("doc_id", "text")

  test("jaccardPairs: planted hot shingle explodes uncapped, bounded with cap") {
    val uncapped = Dedup.jaccardPairs(hotCorpus, "doc_id", "text", dfCap = Int.MaxValue)
    assert(uncapped.count() === N.toLong * (N - 1) / 2,
      "one shingle in every doc => all-pairs blow-up without the cap")
    val capped = Dedup.jaccardPairs(hotCorpus, "doc_id", "text", dfCap = 16)
    assert(capped.count() === 0,
      "df>cap shingle is dropped; unique tails share nothing")
  }

  test("jaccardPairs: cap is a no-op when no shingle is hot") {
    val corpus = (1 to 40).map { i =>
      // overlapping tails: consecutive docs share shingles (df <= 2)
      (i.toLong, (i to i + 9).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val a = Dedup.jaccardPairs(corpus, "doc_id", "text", dfCap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Dedup.jaccardPairs(corpus, "doc_id", "text", dfCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b)
    assert(a.nonEmpty, "overlapping tails must produce pairs")
  }

  test("minhashCandidatePairs: identical-doc bucket capped; exact path still catches them") {
    val copies = (1 to N).map(i => (i.toLong, "same text " + (1 to 20).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val bands = Dedup.minhashBands(copies, "doc_id", "text")
    val uncapped = Dedup.minhashCandidatePairs(bands, "doc_id", maxBucket = Int.MaxValue)
    assert(uncapped.count() === N.toLong * (N - 1) / 2,
      "300 identical docs => one bucket per band => all-pairs blow-up")
    val capped = Dedup.minhashCandidatePairs(bands, "doc_id", maxBucket = 16)
    assert(capped.count() === 0, "oversized buckets dropped before the join")
    // the linear-cost exact path owns mass duplicates:
    val exact = Dedup.exactGroups(copies, "doc_id", "text")
    assert(exact.count() === 1)
    assert(exact.head.getAs[Long]("n_copies") === N.toLong)
  }
}
