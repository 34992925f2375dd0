package graft

import org.apache.spark.sql.functions._

/** Invariants for the sixty-first wave, each re-derived in the JVM by a
  * DIFFERENT algorithm than the declared query uses (the shared-formula
  * blind-spot discipline):
  *
  *  - q346 HITS: direct map-based power iteration over collected edges;
  *  - q347: brute-force all-pairs position-compare (the O(N²) join the
  *    deletion-neighborhood blocking replaces) — counts must be equal,
  *    proving the blocking has exact recall;
  *  - q348: brute-force all-pairs distance scan vs the 3×3 cell probe;
  *  - q349: per-status recount straight off the orders table;
  *  - q350: union-find components (vs star contraction) + JVM gram
  *    scores; the canonical must be the argmax-score member.
  */
class Training61Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q346: HITS authorities re-derive via direct JVM power iteration") {
    val edges = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    def halfUp(s: Long, m: Long): Long = (2 * s * 1000000L + m) / (2 * m)
    val byP = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val byO = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val a1r = byP.view.mapValues(os => 1000000L * os.size).toMap
    val a1 = { val m = a1r.values.max; a1r.view.mapValues(halfUp(_, m)).toMap }
    val h1r = byO.view.mapValues(ps => ps.map(a1).sum).toMap
    val h1 = { val m = h1r.values.max; h1r.view.mapValues(halfUp(_, m)).toMap }
    val a2r = byP.view.mapValues(os => os.map(h1).sum).toMap
    val a2 = { val m = a2r.values.max; a2r.view.mapValues(halfUp(_, m)).toMap }
    val want = a2.toSeq.sortBy { case (p, a) => (-a, p) }.take(10)
    val got = q("q346_hits").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("q347: blocking has exact recall vs brute-force position compare") {
    val names = Tables(spark, dir, "customer")
      .select("c_name").distinct().collect().map(_.getString(0))
    val want = (for {
      i <- names.indices; j <- (i + 1) until names.length
      (a, b) = (names(i), names(j)) if a.length == b.length
      diffs = a.indices.filter(k => a(k) != b(k)) if diffs.length == 1
    } yield diffs.head + 1)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("q347_deletion_neighborhood_join").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.sum > 0, "degenerate: no lev-1 pairs fired")
  }

  test("q348: cell probe equals brute-force distance scan") {
    val pts = Tables(spark, dir, "customer").select(
      col("c_custkey"),
      expr(s"${graft.operators.TextOps.hash60Spark("concat(cast(c_custkey as string), ':x')")} % 1024"),
      expr(s"${graft.operators.TextOps.hash60Spark("concat(cast(c_custkey as string), ':y')")} % 1024"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      i <- pts.indices; j <- (i + 1) until pts.length
      (a, b) = if (pts(i)._1 < pts(j)._1) (pts(i), pts(j)) else (pts(j), pts(i))
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= 1024
    } yield (a._1, b._1, d2))
      .sortBy { case (ia, ib, d2) => (d2, ia, ib) }.take(10)
    val got = q("q348_grid_proximity_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "degenerate: no proximal pairs")
  }

  test("q349: merged-schema rollup recounts from orders") {
    val got = q("q349_schema_evolution_scan").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val rows = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = rows.groupBy { case (k, st) =>
      if (k % 2 == 0) "<pre_schema>" else st
    }.view.mapValues(_.length.toLong).toMap
    assert(got === want)
    assert(got.contains("<pre_schema>") && got.size >= 2)
  }

  test("q350: canonical is the argmax-quality member of union-find clusters") {
    import graft.operators.Dedup
    val docs = Tables(spark, dir, "documents")
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashBands(docs, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent components: union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq.groupBy(find)
    // independent score: distinct word-3-grams per doc, JVM strings
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def score(id: Long): Long = {
      val ws = texts(id).split(" ")
      val nG = math.max(ws.length - 2, 1).toLong
      val nD =
        if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet.size.toLong
        else 1L
      nD * 1000000L / nG
    }
    val got = q("q350_dedup_canonical_quality").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = members.map { case (root, ms) =>
      val canon = ms.map(m => (-score(m), m)).min._2
      root -> (canon, ms.size.toLong)
    }
    assert(got === want)
    assert(got.nonEmpty && got.values.exists(_._2 >= 2))
  }
}
