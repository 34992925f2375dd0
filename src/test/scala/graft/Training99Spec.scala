package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninety-ninth wave:
  *
  *  - q459: JVM Gale–Shapley replay (sequential single-proposal variant —
  *    a DIFFERENT algorithm schedule than the query's simultaneous
  *    rounds; both must land on the same proposer-optimal matching, a
  *    classic GS theorem) plus an independent brute-force blocking-pair
  *    check over the raw preference profiles.
  *  - q460: JVM Huffman replay with a priority queue under the same
  *    (weight, root-id) tie-break; Kraft equality Σ 2^(24−len) = 2^24;
  *    the weight-monotonicity law (heavier symbol never gets a longer
  *    code); and when all weights are positive, the Shannon bound
  *    H ≤ L̄ < H + 1 on the weighted average length.
  *  - q461: JVM dynamic-programming replay of the full 12×12 DTW grid
  *    (row-major order — not the query's anti-diagonal waves); final
  *    row matches; DTW ≤ lockstep distance (the diagonal path is one
  *    admissible warping path).
  */
class Training99Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  private def prefTables() = {
    val rows = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"),
        expr("c.c_custkey = o.o_custkey"))
      .groupBy(col("c.c_mktsegment").as("prop"),
        col("o.o_orderpriority").as("rev"))
      .agg(
        expr("CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) * 1000000 div count(*) AS BIGINT)").as("avgm"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val props = rows.map(_._1).distinct.sorted
    val revs = rows.map(_._2).distinct.sorted
    val pRank: Map[(String, String), Int] = props.flatMap { p =>
      rows.filter(_._1 == p).sortBy { case (_, r, m, _) => (-m, r) }
        .zipWithIndex.map { case ((_, r, _, _), i) => ((p, r), i + 1) }
    }.toMap
    val rRank: Map[(String, String), Int] = revs.flatMap { r =>
      rows.filter(_._2 == r).sortBy { case (p, _, _, n) => (-n, p) }
        .zipWithIndex.map { case ((p, _, _, _), i) => ((r, p), i + 1) }
    }.toMap
    (props, revs, pRank, rRank)
  }

  test("q459: sequential-GS replay lands on the same matching; no blocking pair") {
    val (props, revs, pRank, rRank) = prefTables()
    // proposer's list ordered by their rank
    val plist: Map[String, Seq[String]] = props.map { p =>
      p -> revs.sortBy(r => pRank((p, r))).toSeq
    }.toMap
    // classic sequential GS: one free proposer proposes at a time
    val ptr = collection.mutable.Map(props.map(_ -> 0): _*)
    val hold = collection.mutable.Map[String, String]() // rev -> prop
    val free = collection.mutable.Queue(props: _*)
    while (free.nonEmpty) {
      val p = free.dequeue()
      val r = plist(p)(ptr(p))
      hold.get(r) match {
        case None => hold(r) = p
        case Some(cur) =>
          if (rRank((r, p)) < rRank((r, cur))) {
            hold(r) = p; ptr(cur) += 1; free.enqueue(cur)
          } else { ptr(p) += 1; free.enqueue(p) }
      }
    }
    val want = hold.map { case (r, p) => p -> r }.toMap
    val got = q("q459_stable_matching").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq === props.toSeq)
    got.foreach { case (p, r, prk, rrk, nb) =>
      assert(r === want(p), s"match($p)")
      assert(prk === pRank((p, r)).toLong)
      assert(rrk === rRank((r, p)).toLong)
      assert(nb === 0L, "stability certificate")
    }
    // independent brute-force blocking-pair check
    val m = got.map(x => (x._1, x._2)).toMap
    val rm = got.map(x => (x._2, x._1)).toMap
    for (p <- props; r <- revs if m(p) != r) {
      val blocks = pRank((p, r)) < pRank((p, m(p))) &&
        rRank((r, p)) < rRank((r, rm(r)))
      assert(!blocks, s"blocking pair ($p, $r)")
    }
  }

  test("q460: PQ Huffman replay; Kraft identity; weight monotonicity") {
    val weights = Tables(spark, dir, "nation").as("n")
      .join(Tables(spark, dir, "customer").as("c"),
        expr("c.c_nationkey = n.n_nationkey"), "left")
      .join(Tables(spark, dir, "orders").as("o"),
        expr("o.o_custkey = c.c_custkey"), "left")
      .groupBy(expr("CAST(n.n_nationkey AS BIGINT)").as("k"), col("n.n_name").as("nm"))
      .agg(count(col("o.o_orderkey")).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // PQ replay: merge two smallest (w, rid); merged rid = min
    case class Node(rid: Long, w: Long, leaves: Set[Long])
    val pq = collection.mutable.SortedSet[(Long, Long)]()(Ordering.Tuple2)
    val nodes = collection.mutable.Map[Long, Node]()
    weights.foreach { case (k, _, w) =>
      pq += ((w, k)); nodes(k) = Node(k, w, Set(k))
    }
    val depth = collection.mutable.Map(weights.map(x => x._1 -> 0L): _*)
    while (pq.size > 1) {
      val a = pq.head; pq -= a
      val b = pq.head; pq -= b
      val na = nodes(a._2); val nb = nodes(b._2)
      (na.leaves ++ nb.leaves).foreach(l => depth(l) += 1)
      val merged = Node(math.min(na.rid, nb.rid), na.w + nb.w, na.leaves ++ nb.leaves)
      nodes(merged.rid) = merged
      pq += ((merged.w, merged.rid))
    }
    val got = q("q460_huffman_lengths").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length === weights.length)
    val byName = weights.map(x => (x._2, x)).toMap
    got.foreach { case (nm, w, len, wbits, _, kraft) =>
      val (k, _, ww) = byName(nm)
      assert(w === ww, s"weight($nm)")
      assert(len === depth(k), s"code_len($nm)")
      assert(wbits === w * len)
      assert(kraft === (1L << 24), "Kraft equality")
    }
    val totalBits = got.map(_._4).sum
    assert(got.forall(_._5 === totalBits))
    // heavier symbol never has a longer code
    for (a <- got; b <- got if a._2 > b._2)
      assert(a._3 <= b._3, s"monotonicity ${a._1} vs ${b._1}")
    // Shannon bound on the weighted average length (positive weights only)
    if (got.forall(_._2 > 0)) {
      val tw = got.map(_._2).sum.toDouble
      val h = got.map { g => val p = g._2 / tw; -p * math.log(p) / math.log(2) }.sum
      val lbar = totalBits / tw
      assert(lbar >= h - 1e-9 && lbar < h + 1, f"H=$h%.4f Lbar=$lbar%.4f")
    }
  }

  test("q461: row-major DP replay; DTW <= lockstep") {
    def series(year: Int): Map[Long, Long] = Tables(spark, dir, "orders")
      .filter(expr(s"year(o_orderdate) = $year"))
      .groupBy(expr("CAST(month(o_orderdate) AS BIGINT)").as("m"))
      .agg(expr("CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val a = series(1996); val b = series(1997)
    assert(a.size === 12 && b.size === 12, "both years fully populated")
    val d = Array.ofDim[Long](13, 13)
    for (i <- 1 to 12; j <- 1 to 12) {
      val cost = math.abs(a(i.toLong) - b(j.toLong))
      d(i)(j) = cost + ((i, j) match {
        case (1, 1) => 0L
        case (1, _) => d(1)(j - 1)
        case (_, 1) => d(i - 1)(1)
        case _ => math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
      })
    }
    val lockstep = (1 to 12).map(m => math.abs(a(m.toLong) - b(m.toLong))).sum
    val got = q("q461_dtw_alignment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(x => (x._1, x._2)).toSeq === (1 to 12).map(j => (j.toLong, d(12)(j))))
    got.foreach { case (_, _, dtw, ls) =>
      assert(dtw === d(12)(12))
      assert(ls === lockstep)
      assert(dtw <= ls, "DTW never exceeds the lockstep path")
    }
  }
}
