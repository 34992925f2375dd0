package graft

import org.apache.spark.sql.functions._

/** Invariants for the eighty-second wave:
  *
  *  - q410: the decomposition property holds (between + Σshare·within
  *    ≈ the directly-computed total Theil, within rounding), every
  *    within term is ≥ −1 micro-nat (Jensen up to rounding), and the
  *    pieces re-derive from a double-precision JVM replica;
  *  - q411: per-month shares sum to ~1e6 ppm and month shares sum to
  *    ~1e6 ppm (half-up rounding bounded drift);
  *  - q412: the capped-postings top-10 matches a JVM brute-force
  *    sparse dot over the SAME top-8 sparsification, proving the
  *    posting cap lost nothing at harness scale.
  */
class Training82Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q410: decomposition adds up; within terms >= -1 micro") {
    val rows = q("q410_theil_decomposition").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val within = rows.find(_._1 == "_within").get._4
    val between = rows.find(_._1 == "_between").get._4
    val leaves = rows.filterNot(_._1.startsWith("_"))
    assert(leaves.forall(_._4 >= -1L), "Jensen up to micro rounding")
    // JVM double replica of total Theil
    val xs = Tables(spark, dir, "orders")
      .selectExpr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(_.getLong(0).toDouble)
    val mu = xs.sum / xs.length
    val tTotal = xs.map(x => x / xs.sum * math.log(x / mu)).sum
    val got = (within + between) / 1e6
    assert(math.abs(got - tTotal) < 0.002,
      s"between+within=$got vs direct total=$tTotal")
    assert(between > 0L || within > 0L, "some inequality must exist")
  }

  test("q411: shares sum to ~1e6 ppm per parent") {
    val rows = q("q411_share_of_parent").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (m, g) =>
      val s = g.map(_._4).sum
      assert(math.abs(s - 1000000L) <= g.length,
        s"month $m leaf shares sum to $s")
    }
    val monthShares = rows.groupBy(_._1).view.mapValues(_.head._5).toMap
    val ms = monthShares.values.sum
    assert(math.abs(ms - 1000000L) <= monthShares.size.toLong,
      s"month shares sum to $ms")
  }

  test("q412: capped-postings top-10 equals brute sparse dot") {
    val vs = Tables(spark, dir, "embeddings").selectExpr("vec_id",
      """transform(embedding,
         x -> cast(round(cast(x as double) * 1000000, 0) as bigint))""")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    // top-8 dims by (|w| desc, dim) — the declared sparsification
    val sparse = vs.map { case (id, w) =>
      id -> w.zipWithIndex
        .sortBy { case (x, i) => (-math.abs(x), i) }.take(8)
        .map { case (x, i) => (i, x) }.toMap
    }
    val pairs = for {
      i <- sparse.indices; j <- (i + 1) until sparse.length
      (ida, wa) = sparse(i); (idb, wb) = sparse(j)
      shared = wa.keySet.intersect(wb.keySet)
      if shared.nonEmpty
      dot = shared.toSeq.map(k => wa(k) * wb(k)).sum
    } yield (math.min(ida, idb), math.max(ida, idb), dot)
    val want = pairs.sortBy { case (u, v, dd) => (-dd, u, v) }.take(10)
    val got = q("q412_sparse_dot_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want)
    assert(got.head._3 > 0L, "the top pair must share mass")
  }
}
