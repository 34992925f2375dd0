package graft

import org.apache.spark.sql.functions._

import graft.operators.{LinkPrediction, Similarity}

/** Invariants for the forty-second wave (q294/q295, the declared
  * approx-percentile production twins) and the round-8 scale
  * dispatchers:
  *
  *  - the q294/q295 rank gates are re-derived INDEPENDENTLY in the JVM
  *    (direct rank counting over collected values vs the queries'
  *    bucket-histogram reconstruction — different algebraic form, the
  *    shared-formula-blind-spot discipline);
  *  - LinkPrediction.topK routes to the exact wedge form below the
  *    wedge-mass limit and the minhash form above it, and each branch
  *    equals its declared standalone query (q223 / q231);
  *  - Similarity.autoTopK routes to brute force below the corpus limit
  *    and IVF above it (full-probe confs ⇒ the identity makes the two
  *    branches comparable exactly).
  */
class Training42Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q294: gates hold and the rank contract re-derives in the JVM") {
    val out = q("q294_ks_drift_tdigest").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Boolean]("grid_ok") && r.getAs[Boolean]("d_valid"))

    // independent recount: n_r/n_a by direct filter count
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag").as("f"), col("l_extendedprice").as("x"))
      .filter(col("f").isin("R", "A"))
    val xs = li.collect().map(row => (row.getString(0), row.getDouble(1)))
    assert(r.getAs[Long]("n_r") === xs.count(_._1 == "R").toLong)
    assert(r.getAs[Long]("n_a") === xs.count(_._1 == "A").toLong)

    // independent rank-straddle check: fresh sketch call, direct rank
    // count over the collected values (no bucket histograms involved)
    val qs = (1 to 99).map(i => i / 100.0).mkString(", ")
    val bs = li.agg(expr(s"approx_percentile(x, array($qs), 10000)").as("bs"))
      .head().getSeq[Double](0)
    val n = xs.length
    val slack = n / 1000 + 4
    val vals = xs.map(_._2)
    bs.zipWithIndex.foreach { case (b, i0) =>
      val i = i0 + 1
      val lt = vals.count(_ < b)
      val le = vals.count(_ <= b)
      assert(lt * 100 <= i * n + 100 * slack, s"boundary $i lt rank off")
      assert(le * 100 >= i * n - 100 * slack, s"boundary $i le rank off")
    }
  }

  test("q295: per-day gates hold and n re-derives in the JVM") {
    val out = q("q295_quantile_bands_tdigest").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Boolean]("band10_ok") &&
      r.getAs[Boolean]("band50_ok") && r.getAs[Boolean]("band90_ok")))
    val jvmN = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("day")).collect()
      .groupBy(_.get(0).toString).view.mapValues(_.length.toLong).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n") === jvmN(r.get(0).toString),
        s"day ${r.get(0)} count off")
    }
  }

  private def undEdges() = {
    val op = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val e = op.as("a").join(op.as("b"),
      col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
    e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
  }

  test("LinkPrediction.topK dispatch: each branch equals its declared query") {
    val exact = LinkPrediction.topK(undEdges(), k = 20, degCap = 512,
      wedgeMassLimit = Long.MaxValue).collect().map(_.toSeq).toSeq
    val q223 = q("q223_link_prediction").collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty && exact === q223,
      "exact branch must equal the declared q223 (which routes exact at this mass)")

    val mh = LinkPrediction.topK(undEdges(), k = 20, degCap = 512,
      wedgeMassLimit = 0L).collect().map(_.toSeq).toSeq
    val q231 = q("q231_link_prediction_minhash").collect().map(_.toSeq).toSeq
    assert(mh.nonEmpty && mh === q231,
      "minhash branch must equal the declared q231 twin")
  }

  test("LinkPrediction.topK reads the wedge-mass limit from conf") {
    try {
      spark.conf.set("spark.graft.graph.wedgeMassLimit", "0")
      val routed = LinkPrediction.topK(undEdges(), k = 20).collect().map(_.toSeq).toSeq
      val q231 = q("q231_link_prediction_minhash").collect().map(_.toSeq).toSeq
      assert(routed === q231, "conf-set limit 0 must route to the minhash branch")
    } finally spark.conf.unset("spark.graft.graph.wedgeMassLimit")
  }

  test("persisted IVF index: versioned builds, time travel, full-probe identity") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivfidx_spec").toString
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("vec", expr("transform(embedding, x -> cast(x as double))"))
      .select("vec_id", "vec")
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec", k = 3)
      .collect().map(_.toSeq).toSet

    Similarity.buildIvfIndex(emb, "vec_id", "vec", root, version = 0L, nlist = 8)
    Similarity.buildIvfIndex(emb, "vec_id", "vec", root, version = 1L, nlist = 4)
    assert(graft.sources.Sinks.snapshotVersions(s"$root/lists") === Seq(0L, 1L))
    assert(graft.sources.Sinks.snapshotVersions(s"$root/centroids") === Seq(0L, 1L))

    // full probe of EITHER stored version reproduces brute force (the
    // identity the q296 oracle rides on), through entirely different
    // list layouts — so the storage round-trip adds nothing
    val v0 = Similarity.probeIvfIndex(root, queries, "vec_id", "vec",
      k = 3, nprobe = 8, asOfVersion = Some(0L)).collect().map(_.toSeq).toSet
    val latest = Similarity.probeIvfIndex(root, queries, "vec_id", "vec",
      k = 3, nprobe = 4).collect().map(_.toSeq).toSet
    assert(v0 === brute, "v0 full probe must equal brute force")
    assert(latest === brute, "latest (v1, nlist=4) full probe must equal brute force")

    // partial probe of the stored index is a strict subset relation on
    // candidates: every returned neighbor is a true corpus vector with
    // exact cosine (spot the score exactness against brute pairs)
    val partial = Similarity.probeIvfIndex(root, queries, "vec_id", "vec",
      k = 3, nprobe = 1, asOfVersion = Some(1L)).collect()
    val bruteScores = Similarity
      .bruteForceTopK(queries, emb, "vec_id", "vec", k = Int.MaxValue)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    partial.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bruteScores(key) === r.getDouble(2),
        s"stored-index score for $key must be the exact cosine")
    }
  }

  test("Similarity.autoTopK dispatch: brute below the limit, IVF above") {
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("vec", expr("transform(embedding, x -> cast(x as double))"))
      .select("vec_id", "vec")
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "vec", k = 3)
      .collect().map(_.toSeq).toSet
    val below = Similarity.autoTopK(emb, "vec_id", "vec", lit(true), k = 3,
      bruteLimit = Long.MaxValue).collect().map(_.toSeq).toSet
    assert(below === brute, "below the limit autoTopK must be brute force")
    try {
      // full-probe confs ⇒ IVF branch provably equals brute force, so
      // the routing itself is the only variable under test
      spark.conf.set("spark.graft.ann.nlist", "4")
      spark.conf.set("spark.graft.ann.nprobe", "4")
      val above = Similarity.autoTopK(emb, "vec_id", "vec", lit(true), k = 3,
        bruteLimit = 0L).collect().map(_.toSeq).toSet
      assert(above === brute,
        "above the limit autoTopK must take the IVF branch (full-probe identity)")
    } finally {
      spark.conf.unset("spark.graft.ann.nlist")
      spark.conf.unset("spark.graft.ann.nprobe")
    }
  }
}
