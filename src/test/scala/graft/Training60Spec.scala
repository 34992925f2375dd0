package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, Similarity}

/** Invariants for the sixtieth wave (the round-8 verdict closures):
  *
  *  - Graphs.triangleStats routes EXACT below the wedge-mass limit and
  *    DOULION-sampled above it; the sampled estimate re-derives in the
  *    JVM from an independently collected edge sample, and the exact
  *    branch equals a JVM brute-force triangle count;
  *  - Graphs.kcoreRounds routes the exact peel below the edge limit and
  *    the 1-in-p sampled peel above it; the sampled census re-derives
  *    via an independent JVM peel over the collected sample;
  *  - q344's slab gates hold and its layout verdict equals the
  *    exact-boundary verdict re-derived in the JVM (the contract the
  *    oracle pins at sf0.01, re-checked here at sf0.001 where the
  *    OPPOSITE layout wins — both sides of the decision are covered);
  *  - the persisted IVF-PQ probe is bit-identical to the in-query
  *    ivfPqTopK form, and version time travel probes the OLD index
  *    after a rebuild (SinksSpec-style version coverage).
  */
class Training60Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  private def edges() =
    Graphs.coPurchaseEdges(Tables(spark, dir, "lineitem"))

  /** JVM brute-force oriented triangle count over (u<v) edges. */
  private def jvmTriangles(es: Set[(Long, Long)]): Long = {
    val byU = es.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    es.iterator.map { case (u, v) =>
      (byU.getOrElse(u, Set.empty) & byU.getOrElse(v, Set.empty)).size.toLong
    }.sum
  }

  test("q342: DOULION estimate re-derives in the JVM; exact branch matches brute force") {
    val e = edges()
    val es = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = jvmTriangles(es)

    // exact branch (default limit — sf0.001 mass is far below 5e8)
    val ex = Graphs.triangleStats(e).collect().head
    assert(ex.getAs[Long]("n_triangles") === exact)
    assert(ex.getAs[Long]("n_edges") === es.size.toLong)
    assert(ex.getAs[Long]("n_nodes") ===
      es.flatMap(p => Seq(p._1, p._2)).size.toLong)

    // sampled branch (q342's declared form): independent JVM sample —
    // replay the hash selection per edge, count triangles, rescale ×64
    val sampled = Graphs.sampleEdges(e, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sampled.subsetOf(es) && sampled.size < es.size)
    val est = 64L * jvmTriangles(sampled)
    val out = q("q342_triangle_doulion").collect().head
    assert(out.getAs[Long]("n_triangles") === est)
    // the estimate is within 50% of exact even on this tiny graph
    assert(est > exact / 2 && est < exact * 2)
  }

  test("triangle bloom pre-filter: filtered and unfiltered closing joins agree") {
    // the exact-branch assertion above already pins the DEFAULT path
    // (bloom pre-filter on) against the JVM brute force; this is the
    // explicit A/B — triangleBloomMaxEdges=0 forces the unfiltered r12
    // plan, and a bloom filter has no false negatives, so the two
    // counts must be identical on the same graph
    val e = graft.Iterate.ckpt(edges())
    val withBloom = Graphs.exactTriangleCount(e)
    spark.conf.set("spark.graft.graph.triangleBloomMaxEdges", "0")
    try {
      val without = Graphs.exactTriangleCount(e)
      assert(withBloom === without)
      assert(withBloom > 0L) // non-vacuous: the graph has triangles
    } finally spark.conf.unset("spark.graft.graph.triangleBloomMaxEdges")
  }

  /** JVM peel: rounds of drop-degree-below-k over a doubled edge set. */
  private def jvmPeel(
      es: Set[(Long, Long)], k: Int,
      rounds: Int): Seq[(Int, Long, Long)] = {
    var und = es.flatMap(p => Seq(p, p.swap))
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    out += ((0, und.map(_._1).size.toLong, und.size.toLong / 2))
    for (r <- 1 to rounds) {
      val deg = und.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      und = und.filter(p => keep(p._1) && keep(p._2))
      out += ((r, und.map(_._1).size.toLong, und.size.toLong / 2))
    }
    out.toSeq
  }

  test("q343: sampled k-core census re-derives via an independent JVM peel") {
    val e = edges()
    val sampled = Graphs.sampleEdges(e, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = jvmPeel(sampled, k = 20, rounds = 6)
      .map { case (r, n, m) => (r, n, m * 4) }
    val got = q("q343_kcore_sampled").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(got === want)
  }

  test("kcoreRounds dispatch: default routes exact; forced-limit routes sampled") {
    val e = edges()
    val es = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // default: sf0.001's doubled-edge count is far below 1e7 → exact
    val exact = Graphs.kcoreRounds(e, k = 80, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(exact === jvmPeel(es, k = 80, rounds = 2))
    // limit 0 → sampled branch (already covered value-wise by q343;
    // here just pin that the ROUTE differs: round-0 edge count is the
    // rescaled sample, not the full count)
    val routed = Graphs.kcoreRounds(e, k = 80, rounds = 1, edgeLimit = 0L)
      .filter(col("round") === 0).collect().head.getLong(2)
    assert(routed !== es.size.toLong)
  }

  test("q344: gates hold; verdict equals the exact-boundary JVM verdict") {
    val out = q("q344_zorder_layout_sketch").collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Boolean]("slabs_ok")))
    val verdicts = out.map(_.getAs[Boolean]("zorder_wins")).distinct
    assert(verdicts.length === 1)

    // JVM re-derive with EXACT equi-depth boundaries (value at rank
    // ceil(i·n/64) over the sorted keys — a valid exact 64-quantile
    // boundary set; the layout decision must not depend on which exact
    // boundary convention is used, that's what makes it a contract)
    val rows = Tables(spark, dir, "lineitem")
      .select((col("l_partkey") % 1024).as("a"), (col("l_suppkey") % 1024).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def morton(a: Long, b: Long): Long =
      (0 until 10).map(i => (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))).sum
    val n = rows.length
    def area(key: ((Long, Long)) => Long): Long = {
      val sorted = rows.map(key).sorted
      val bs = (1 to 63).map(i => sorted(math.min(n - 1, i * n / 64)))
      def slab(k: Long): Int = {
        val idx = bs.indexWhere(k <= _)
        if (idx < 0) 63 else idx
      }
      rows.groupBy(r => slab(key(r))).values.map { g =>
        val as = g.map(_._1); val bs2 = g.map(_._2)
        (as.max - as.min + 1) * (bs2.max - bs2.min + 1)
      }.sum
    }
    val zWins = area(r => morton(r._1, r._2)) < area(r => r._1 * 1024 + r._2)
    assert(verdicts.head === zWins)
    // at sf0.001 the sparse grid makes LINEAR win — the opposite side
    // of the decision from the sf0.01 oracle run
    assert(!zWins)
    assert(out.forall(_.getAs[Long]("n_rows") === n.toLong))
  }

  test("persisted IVF-PQ probe == in-query ivfPqTopK; time travel probes the old build") {
    val emb = Tables(spark, dir, "embeddings")
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_spec").toString

    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", root,
      version = 0L, nlist = 4, subspaces = 4, subDim = 16,
      codebook = 8, iters = 2)
    val want = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      queryIds = Seq(0L, 1L, 2L), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Similarity.probeIvfPqIndex(root,
      emb.filter(col("vec_id").isin(0L, 1L, 2L)), "vec_id", "embedding",
      k = 3, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)

    // rebuild with a different quantizer (v1): latest changes, v0 stays
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", root,
      version = 1L, nlist = 2, subspaces = 4, subDim = 16,
      codebook = 8, iters = 2)
    val latest = Similarity.probeIvfPqIndex(root,
      emb.filter(col("vec_id").isin(0L, 1L, 2L)), "vec_id", "embedding",
      k = 3, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val asOf0 = Similarity.probeIvfPqIndex(root,
      emb.filter(col("vec_id").isin(0L, 1L, 2L)), "vec_id", "embedding",
      k = 3, nprobe = 2, asOfVersion = Some(0L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(asOf0 === want)
    // v1's 2-list quantizer routes different candidate sets; the ADC
    // distances of at least some rows must differ from v0's
    assert(latest !== want)
  }
}
