package graft

import org.apache.spark.sql.functions._

/** Invariants for the eighty-third wave:
  *
  *  - q413: the incremental commit kept the centroids byte-identical
  *    (no refit), v1's lists strictly contain v0's plus the inserted
  *    vectors assigned to their nearest STORED centroid, and probing
  *    the OLD version time-travels to the pre-insert corpus;
  *  - q414: removal effects re-derive in the JVM, the base absorption
  *    bounds every removal chain from above, and removal effects are
  *    non-negative (dropping a channel can only lose conversions);
  *  - q415: the OTHER row preserves the exact corpus total and the
  *    top-5 really are the revenue leaders.
  */
class Training83Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q413: no refit, superset lists, correct stale-centroid assignment") {
    q("q413_ann_index_incremental").collect() // build v0 + insert v1
    val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_ivfinc_${Integer.toHexString(dir.hashCode)}").toString
    val c0 = spark.read.parquet(s"$root/centroids/v0")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val c1 = spark.read.parquet(s"$root/centroids/v1")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(c0 === c1, "incremental insert must not refit centroids")
    val l0 = spark.read.parquet(s"$root/lists/v0")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val l1 = spark.read.parquet(s"$root/lists/v1")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(l0.forall { case (id, li) => l1.get(id).contains(li) },
      "v1 must contain v0's assignments unchanged")
    val inserted = l1.keySet -- l0.keySet
    assert(inserted.nonEmpty && inserted.forall(_ % 5 == 0))
    // inserted vectors sit in the list of their nearest STORED centroid
    val vecs = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double))")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    inserted.foreach { id =>
      val v = vecs(id)
      val best = c0.toSeq.map { case (li, c) =>
        (c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, li)
      }.minBy { case (d2, li) => (d2, li) }._2
      assert(l1(id) === best, s"vector $id assigned to the wrong list")
    }
  }

  test("q414: removal effects re-derive; base bounds removals; effects >= 0") {
    val got = q("q414_markov_removal_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val base = got.find(_._1 == "_base").get._2
    got.filterNot(_._1 == "_base").foreach { case (ch, a, eff) =>
      assert(a <= base, s"$ch: removal cannot raise absorption")
      assert(eff >= 0L && eff <= 1000000L, s"$ch effect in [0, 1e6]")
      // the declared effect is the half-up ppm of the lost absorption
      val want = (2 * 1000000L * (base - a) + base) / (2 * base)
      assert(eff === want, ch)
    }
    assert(got.map(_._1).sorted.toSeq ===
      Seq("_base", "click", "error", "signup"))
  }

  test("q415: OTHER preserves the exact total; top-5 are the leaders") {
    val rows = q("q415_topn_other_rollup").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 6 && rows.count(_._1 == "OTHER") === 1)
    val perPart = Tables(spark, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
        .as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.map(_._2).sum === perPart.map(_._2).sum,
      "OTHER must preserve the corpus total")
    val top5 = perPart.sortBy { case (k, c) => (-c, k) }.take(5)
    assert(rows.take(5).map(_._1).toSeq ===
      top5.map(_._1.toString).toSeq, "top-5 identity and order")
    assert(rows.take(5).map(_._2).toSeq === top5.map(_._2).toSeq)
  }
}
