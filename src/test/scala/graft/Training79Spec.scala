package graft

import org.apache.spark.sql.functions._

/** Invariants for the seventy-ninth wave:
  *
  *  - q402: tokenization is injective on the harness keys (no hash
  *    collisions broke the FK graph), the census equals the raw join,
  *    and the preserved flag is computed, not assumed;
  *  - q403: the Apriori candidate set CONTAINS every true triple with
  *    support ≥ minsup (JVM brute-force over the collected baskets —
  *    the level-wise pruning soundness property), and the declared
  *    top-20 matches the brute ranking;
  *  - q404: buckets are exact power-of-two ceilings (integer replica),
  *    waste accounting adds up, and every doc lands in exactly one
  *    bucket.
  */
class Training79Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q402: tokens are injective here; census equals the raw join") {
    val keys = Tables(spark, dir, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def tok(k: Long): String =
      md.digest(s"graft-salt:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(keys.map(tok).distinct.length === keys.length,
      "tokenization must be injective on the key domain")
    val got = q("q402_tokenization_join_preserving").collect()
    assert(got.forall(_.getBoolean(3)), "every segment must preserve")
    val want = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map(r => r.getString(0) -> r.getLong(1)).toMap === want)
  }

  test("q403: Apriori candidates contain all true triples; top-20 matches brute") {
    val baskets = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pairSup = scala.collection.mutable.Map.empty[(Long, Long), Long]
    val triSup = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    baskets.values.foreach { ps =>
      val s = ps.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) {
        pairSup((s(i), s(j))) = pairSup.getOrElse((s(i), s(j)), 0L) + 1
        for (k <- (j + 1) until s.length)
          triSup((s(i), s(j), s(k))) =
            triSup.getOrElse((s(i), s(j), s(k)), 0L) + 1
      }
    }
    val fp = pairSup.filter(_._2 >= 2).keySet
    // soundness: every triple with support >= 2 must survive pruning
    triSup.filter(_._2 >= 2).keys.foreach { case (a, b, c) =>
      assert(fp((a, b)) && fp((a, c)) && fp((b, c)),
        s"($a,$b,$c) lost by Apriori pruning")
    }
    // declared = top-20 candidates by support; re-derive candidates
    val cands = for {
      (a, b) <- fp.toSeq; (a2, c) <- fp.toSeq
      if a2 == a && b < c && fp((b, c))
    } yield (a, b, c)
    val want = cands.map(t => (t, triSup.getOrElse(t, 0L)))
      .filter(_._2 > 0)
      .sortBy { case ((a, b, c), s0) => (-s0, a, b, c) }.take(20)
      .map { case ((a, b, c), s0) => (a, b, c, s0) }
    val got = q("q403_frequent_triples").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
  }

  test("q404: buckets are exact power-of-two ceilings; accounting adds up") {
    def bucketOf(n: Int): Long =
      if (n <= 1) 1L else java.lang.Long.highestOneBit((n - 1).toLong) * 2
    assert(bucketOf(1) === 1L && bucketOf(2) === 2L && bucketOf(3) === 4L &&
      bucketOf(64) === 64L && bucketOf(65) === 128L)
    val toks = Tables(spark, dir, "documents")
      .selectExpr("size(split(trim(text), ' +'))")
      .collect().map(_.getInt(0))
    val want = toks.groupBy(n => bucketOf(n)).view.mapValues { g =>
      (g.length.toLong, g.map(_.toLong).sum) }.toMap
    val got = q("q404_length_bucketing_waste").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    // waste accounting: padded = bucket * n_docs, waste in [0, 1e6)
    q("q404_length_bucketing_waste").collect().foreach { r =>
      assert(r.getLong(3) === r.getLong(0) * r.getLong(1))
      assert(r.getLong(4) >= 0L && r.getLong(4) < 1000000L)
    }
    assert(got.values.map(_._1).sum === toks.length.toLong,
      "every doc in exactly one bucket")
  }
}
