package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity

/** User-facing similarity-search API over (id, array<double> vector)
  * frames: exact brute-force top-k (the oracle/baseline) and
  * multi-table random-hyperplane LSH ANN (the scale path). Cosine is
  * the native codegen expression graft_cosine.
  */
object Similarity {

  /** Exact top-k cosine neighbors of `queries` against `corpus`
    * (broadcast cross join — O(Q·N); correct baseline, not the
    * production path for large Q).
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    CosineSimilarity.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"))
    val sims = broadcast(q).join(c, col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", round(expr("graft_cosine(__qv, __cv)"), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("cand_id").asc)
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "cand_id", "cos_sim", "rnk")
  }

  /** Hard-negative mining for contrastive training: top-k most-similar
    * corpus vectors whose `labelCol` DIFFERS from the query's. Same
    * shape as [[bruteForceTopK]] plus the contrast predicate; swap the
    * broadcast cross join for LSH/IVF candidates (q50/q63 paths) when
    * the corpus outgrows exact scoring — the predicate composes
    * unchanged.
    */
  def hardNegativesTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    CosineSimilarity.register(queries.sparkSession)
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"), col(labelCol).as("__ql"))
    val c = corpus.select(
      col(idCol).as("cand_id"), col(vecCol).as("__cv"), col(labelCol).as("__cl"))
    val sims = broadcast(q)
      .join(c, col("query_id") =!= col("cand_id") && col("__ql") =!= col("__cl"))
      .withColumn("cos_sim", round(expr("graft_cosine(__qv, __cv)"), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("cand_id").asc)
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "cand_id", "cos_sim", "rnk")
  }

  /** Attach `tables` LSH bucket columns (b0..b{tables-1}) of
    * `planesPerTable` hyperplanes each.
    */
  def withLshBuckets(
      df: DataFrame, vecCol: String, dim: Int,
      tables: Int = 2, planesPerTable: Int = 4): DataFrame =
    (0 until tables).foldLeft(df) { (d, t) =>
      d.withColumn(s"b$t",
        expr(VectorOps.lshBucketSpark(vecCol, dim, planesPerTable, offset = t * planesPerTable)))
    }

  /** ANN top-k: candidates are the union of same-bucket neighbors
    * across the LSH tables; exact cosine ranks within candidates.
    */
  def annTopK(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      queryFilter: org.apache.spark.sql.Column, k: Int,
      tables: Int = 2, planesPerTable: Int = 4): DataFrame = {
    CosineSimilarity.register(df.sparkSession)
    val bucketed = withLshBuckets(df, vecCol, dim, tables, planesPerTable).cache()
    try {
      val cands = (0 until tables).map { t =>
        val q = bucketed.filter(queryFilter)
          .select(col(idCol).as("query_id"), col(s"b$t").as("bucket"))
        val c = bucketed.select(col(idCol).as("cand_id"), col(s"b$t").as("bucket"))
        q.join(c, Seq("bucket")).filter(col("query_id") =!= col("cand_id"))
          .select("query_id", "cand_id")
      }.reduce(_ unionByName _).distinct()
      val qv = bucketed.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      val cv = bucketed.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"))
      val sims = cands.join(broadcast(qv), "query_id").join(cv, "cand_id")
        .withColumn("cos_sim", round(expr("graft_cosine(__qv, __cv)"), 4))
      val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("cand_id").asc)
      sims.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", "rnk")
        .localCheckpoint() // materialize so the cache can be freed
    } finally bucketed.unpersist()
  }

  /** Corpus-as-queries top-k with a SCALE-DISPATCHED default (the
    * `Dedup.dedupe`/`LinkPrediction.topK` pattern): the corpus size —
    * the brute-force path's resource, since corpus-as-queries scoring is
    * O(N²) — is measured with one count, and the call routes:
    *
    *  - N ≤ `bruteLimit` → engine-exact [[bruteForceTopK]] (the oracle
    *    truth; a 100k-vector corpus is ~1e10 codegen'd cosine pairs,
    *    the measured single-box comfort ceiling);
    *  - N > limit → [[ivfTopK]] with nlist = ⌈√N⌉ (constant ~√N list
    *    length, the standard IVF sizing) and a 16-list probe budget —
    *    candidates per query then stay ~16√N instead of N, which is
    *    what keeps mutual-kNN / label-audit composites linear.
    *
    * The limit is overridable via conf `spark.graft.ann.bruteLimit`;
    * nlist/nprobe explicitly set via `spark.graft.ann.nlist`/`.nprobe`
    * still win (the q229/q230 ScaleCheck knobs). Semantics above the
    * limit are approximate top-k (IVF recall contract, measured by the
    * q277/q286 recall evals) — the standard ANN trade, made by the
    * DEFAULT so a user reaching for "kNN over my corpus" gets the form
    * that survives 100 TB without reading any scaladoc.
    */
  def autoTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryFilter: org.apache.spark.sql.Column, k: Int,
      bruteLimit: Long = -1L, seed: Long = 42L): DataFrame = {
    val s = df.sparkSession
    val limit =
      if (bruteLimit >= 0) bruteLimit
      else s.conf.get("spark.graft.ann.bruteLimit", "100000").toLong
    val n = df.count()
    if (n <= limit)
      bruteForceTopK(df.filter(queryFilter), df, idCol, vecCol, k)
    else {
      val nlist = s.conf.get("spark.graft.ann.nlist",
        math.ceil(math.sqrt(n.toDouble)).toLong.toString).toInt
      val nprobe = s.conf.get("spark.graft.ann.nprobe", "16").toInt
      ivfTopK(df, idCol, vecCol, queryFilter, k,
        nlist = nlist, nprobe = nprobe, seed = seed)
    }
  }

  /** IVF (inverted-file) ANN — the k-means-quantizer scale path beside
    * LSH: fit `nlist` coarse centroids over the corpus (MLlib KMeans,
    * seed-pinned), assign every vector to its nearest list, then answer
    * queries by probing only the `nprobe` nearest lists and re-ranking
    * those candidates with exact cosine.
    *
    * Scale shape: the corpus shuffles once on list id (or is written
    * bucketed by it); a query touches nprobe/nlist of the data instead
    * of all of it. Centroids are tiny (nlist×dim) → always broadcast.
    */
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryFilter: org.apache.spark.sql.Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    CosineSimilarity.register(df.sparkSession)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // Resolve the query set against the FULL input frame before the
    // index projection: `queryFilter` may reference any df column, and
    // filtering the (id, vec, list) projection instead would resolve
    // only below the brute-force dispatch limit and then throw the day
    // the corpus outgrows it.
    val queryIds = df.filter(queryFilter).select(col(idCol)).distinct()
    val assembled = df
      .select(col(idCol), col(vecCol))
      .withColumn("__fv", array_to_vector(col(vecCol)))
      .cache() // KMeans.fit is iterative — never recompute upstream per pass
    try {
      val model = new KMeans()
        .setK(nlist).setSeed(seed)
        .setFeaturesCol("__fv").setPredictionCol("__list")
        .fit(assembled)
      val listed = model.transform(assembled)
        .select(col(idCol), col(vecCol), col("__list")).cache()
      try {
        listed.count()
        val centroids = {
          import df.sparkSession.implicits._
          model.clusterCenters.zipWithIndex.toSeq
            .map { case (c, i) => (i, c.toArray.toSeq) }
            .toDF("__list", "__centroid")
        }
        // nprobe nearest lists per query by L2 distance to the centroid
        val l2 = expr(
          "aggregate(zip_with(__qv, __centroid, (a, b) -> (a - b) * (a - b)), 0D, (acc, v) -> acc + v)")
        val queries = listed.join(queryIds, Seq(idCol), "left_semi")
          .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
        val probeW = Window.partitionBy("query_id").orderBy(col("__d2").asc, col("__list").asc)
        val probes = queries.crossJoin(broadcast(centroids))
          .withColumn("__d2", l2)
          .withColumn("__pr", row_number().over(probeW))
          .filter(col("__pr") <= nprobe)
          .select("query_id", "__qv", "__list")
        val cands = probes.join(
          listed.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"), col("__list")),
          Seq("__list"))
          .filter(col("query_id") =!= col("cand_id"))
        val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("cand_id").asc)
        cands
          .withColumn("cos_sim", round(expr("graft_cosine(__qv, __cv)"), 4))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= k)
          .select("query_id", "cand_id", "cos_sim", "rnk")
          .localCheckpoint() // materialize so the caches can be freed
      } finally listed.unpersist()
    } finally assembled.unpersist()
  }

  /** Build-once/probe-many IVF index persisted as versioned snapshots
    * (the real 100 TB shape — [[ivfTopK]] refits the quantizer inside
    * every query, which is the right ORACLE form but not a deployment:
    * an index over a 100 TB corpus is built once and probed by every
    * query after).
    *
    * Layout under `indexRoot`: two versioned snapshot directories in
    * the Sinks commit protocol (`v<N>` + `_SUCCESS`, readable via
    * `readSnapshot`/`readLatestSnapshot`):
    *   - `lists/v<N>`: (id, vec, list_id) — the corpus routed to its
    *     inverted list; at deployment scale this is additionally
    *     written partitioned/bucketed BY list_id so a probe prunes to
    *     nprobe directories instead of shuffling;
    *   - `centroids/v<N>`: (list_id, centroid) — quantizer state,
    *     nlist×dim, always broadcast-sized.
    * A rebuild writes a NEW version (full replacement — an index
    * version is an atomic artifact, not a row-merge), so older versions
    * stay probe-able (time travel) and a crashed build (no `_SUCCESS`)
    * is invisible.
    */
  def buildIvfIndex(
      df: DataFrame, idCol: String, vecCol: String, indexRoot: String,
      version: Long, nlist: Int = 16, seed: Long = 42L): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val assembled = df
      .select(col(idCol), col(vecCol))
      .withColumn("__fv", array_to_vector(col(vecCol)))
      .cache() // KMeans.fit is iterative — never recompute upstream per pass
    try {
      val model = new KMeans()
        .setK(nlist).setSeed(seed)
        .setFeaturesCol("__fv").setPredictionCol("list_id")
        .fit(assembled)
      model.transform(assembled)
        .select(col(idCol), col(vecCol), col("list_id"))
        .write.mode("overwrite").parquet(s"$indexRoot/lists/v$version")
      val centroids = {
        import df.sparkSession.implicits._
        model.clusterCenters.zipWithIndex.toSeq
          .map { case (c, i) => (i, c.toArray.toSeq) }
          .toDF("list_id", "centroid")
      }
      centroids.write.mode("overwrite").parquet(s"$indexRoot/centroids/v$version")
    } finally { assembled.unpersist(); () }
  }

  /** Incremental insert into a persisted IVF index ([[buildIvfIndex]]):
    * assign the new vectors to their nearest EXISTING centroid (no
    * refit — the production fast path; periodic rebuilds re-balance),
    * append to the inverted lists, and commit as the next version with
    * the centroids carried over unchanged. Returns the new version.
    * Older versions stay readable ([[probeIvfIndex]] time travel).
    *
    * Assignment uses the same L2-to-centroid argmin expression as the
    * probe routing (ties to the smaller list id), so insertion is a
    * pure function of (stored centroids, new vectors).
    */
  def insertIntoIvfIndex(
      indexRoot: String, newVecs: DataFrame,
      idCol: String, vecCol: String): Long = {
    val spark = newVecs.sparkSession
    val latest = graft.sources.Sinks.snapshotVersions(s"$indexRoot/lists").last
    val lists = graft.sources.Sinks
      .readSnapshot(spark, s"$indexRoot/lists", latest)
    val centroids = graft.sources.Sinks
      .readSnapshot(spark, s"$indexRoot/centroids", latest)
    val l2 = expr(
      "aggregate(zip_with(__nv, centroid, (a, b) -> (a - b) * (a - b)), 0D, (acc, v) -> acc + v)")
    val w = Window.partitionBy(idCol).orderBy(col("__d2").asc, col("list_id").asc)
    val assigned = newVecs.select(col(idCol), col(vecCol))
      .withColumn("__nv", col(vecCol))
      .crossJoin(broadcast(centroids))
      .withColumn("__d2", l2)
      .withColumn("__pr", row_number().over(w))
      .filter(col("__pr") === 1)
      .select(col(idCol), col(vecCol), col("list_id"))
    val next = latest + 1
    lists.unionByName(assigned)
      .write.mode("overwrite").parquet(s"$indexRoot/lists/v$next")
    centroids.write.mode("overwrite").parquet(s"$indexRoot/centroids/v$next")
    next
  }

  /** Probe a persisted IVF index ([[buildIvfIndex]]): route each query
    * to its `nprobe` nearest centroids, candidate-join ONLY those
    * inverted lists, exact-cosine re-rank to top-`k`. `asOfVersion`
    * time-travels to an older index build (Sinks `readSnapshot`
    * resolution); default probes the latest complete build. At
    * nprobe = nlist every list is probed, so the whole stored-index
    * path provably equals brute force — the q63/q229 identity, which
    * is what lets a persisted approximate index be hash-oracled.
    */
  def probeIvfIndex(
      indexRoot: String, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, asOfVersion: Option[Long] = None): DataFrame = {
    val spark = queries.sparkSession
    CosineSimilarity.register(spark)
    def rd(sub: String) = asOfVersion match {
      case Some(v) => graft.sources.Sinks.readSnapshot(spark, s"$indexRoot/$sub", v)
      case None => graft.sources.Sinks.readLatestSnapshot(spark, s"$indexRoot/$sub")
    }
    val lists = rd("lists")
    val centroids = rd("centroids")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val l2 = expr(
      "aggregate(zip_with(__qv, centroid, (a, b) -> (a - b) * (a - b)), 0D, (acc, v) -> acc + v)")
    val probeW = Window.partitionBy("query_id").orderBy(col("__d2").asc, col("list_id").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__d2", l2)
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select("query_id", "__qv", "list_id")
    val cands = probes.join(
      lists.select(col(idCol).as("cand_id"),
        col(vecCol).as("__cv"), col("list_id")),
      Seq("list_id"))
      .filter(col("query_id") =!= col("cand_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("cand_id").asc)
    cands
      .withColumn("cos_sim", round(expr("graft_cosine(__qv, __cv)"), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "cand_id", "cos_sim", "rnk")
  }

  /** SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication of an embedding corpus — cluster with k-means, then
    * within every cluster drop one side of each pair whose cosine
    * similarity clears `threshold` (the lower id survives, matching the
    * exact/minhash dedup survivorship convention). Returns one row per
    * input vector: (idCol, cluster, kept).
    *
    * Clustering uses DeterministicKMeans (exact integer micro-unit
    * arithmetic), so the labels — and therefore the whole result — are
    * bit-identical on any engine/partitioning, which is what lets an
    * iterative-ML + float-similarity composite be SQL-oracled at all.
    * Cosine is rounded to 4 dp before the threshold compare (same
    * discipline as nearDupPairs) so the float boundary is cross-engine
    * stable.
    *
    * Scale shape: the whole point of SemDedup is that k bounds the pair
    * join — clusters hold ~N/k vectors, so the within-cluster self-join
    * is O(N²/k) spread over k independent key groups, and k is chosen
    * ~N/1000 in the paper (cluster size is the knob, not corpus size).
    * The cluster id is the join key, so the only shuffles are the
    * k-means rounds (one keyed agg each) plus one hash exchange on
    * `cluster`; no global window, no driver-side pair state.
    */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 3, threshold: Double = 0.35): DataFrame = {
    CosineSimilarity.register(df.sparkSession)
    val labels = DeterministicKMeans.assignments(df, idCol, vecCol, k, iters)
    val vecs = df.select(
      col(idCol),
      expr(s"transform($vecCol, x -> cast(x as double))").as("__vec"))
    val labeled = vecs.join(labels, idCol).cache()
    try {
      val a = labeled.select(
        col("cluster"), col(idCol).as("__ida"), col("__vec").as("__va"))
      val b = labeled.select(
        col("cluster"), col(idCol).as("__idb"), col("__vec").as("__vb"))
      val dropped = a.join(b, Seq("cluster"))
        .filter(col("__ida") < col("__idb") &&
          round(expr("graft_cosine(__va, __vb)"), 4) >= threshold)
        .select(col("__idb").as(idCol))
        .distinct()
      labeled
        .join(dropped.withColumn("__drop", lit(true)), Seq(idCol), "left")
        .select(col(idCol), col("cluster"),
          not(coalesce(col("__drop"), lit(false))).as("kept"))
        .localCheckpoint() // materialize so the cache can be freed
    } finally labeled.unpersist()
  }

  /** IVF-PQ ANN — the billion-vector index shape: a coarse k-means
    * quantizer partitions the corpus into `nlist` inverted lists, and a
    * product quantizer compresses every vector to `subspaces` small
    * codes; a query probes only its `nprobe` nearest lists and ranks
    * candidates by ADC (asymmetric distance computation) — the sum of
    * per-subspace lookup-table distances from the query subvector to
    * each candidate's codeword — without ever touching the full
    * vectors again.
    *
    * Every fit here is DeterministicKMeans (exact integer micro-units),
    * so codes, probes, ADC tables, and therefore the entire result are
    * bit-identical on any engine/partitioning — an approximate index
    * whose output is still SQL-oracle-checkable. The coarse and
    * subspace fits are independent and run as concurrent Spark jobs.
    *
    * Scale shape: centroids and ADC tables are driver/broadcast-size
    * (nlist·dim + |Q|·subspaces·codebook longs); the corpus shuffles
    * once per code join on the id; candidate scanning touches only
    * nprobe/nlist of the corpus; per-query top-k is TakeOrdered.
    */
  def ivfPqTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int,
      nlist: Int = 4, nprobe: Int = 2,
      subspaces: Int = 4, subDim: Int = 16, codebook: Int = 8,
      iters: Int = 2): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration

    require(queryIds.nonEmpty, "ivfPqTopK: queryIds must be non-empty")
    val emb = df.select(col(idCol), col(vecCol))

    // query vectors in micro-units: |Q| rows, driver-side by design.
    // Collected (and validated) BEFORE the five k-means fits so a bad
    // query id fails in the cheap filter, not after the index build.
    val qRows = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).cast("long"),
        expr(s"transform($vecCol, x -> cast(round(cast(x as double) * 1000000, 0) as bigint))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val missing = queryIds.filterNot(qRows.contains)
    require(missing.isEmpty,
      s"ivfPqTopK: query ids not present in $idCol: ${missing.mkString(", ")}")

    val coarseF = Future(DeterministicKMeans.fit(emb, idCol, vecCol, nlist, iters))
    val pqF = (0 until subspaces).map { s =>
      Future(DeterministicKMeans.fit(
        emb.select(col(idCol),
          expr(s"slice($vecCol, ${s * subDim + 1}, $subDim)").as("sub")),
        idCol, "sub", codebook, iters))
    }
    val (coarseCents, coarseAssign) = Await.result(coarseF, Duration.Inf)
    val pq = pqF.map(Await.result(_, Duration.Inf))

    def sq(a: Array[Long], b: Array[Long]): Long = {
      var i = 0; var s = 0L
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    // ONE plan for the whole query batch (not a per-query union): the
    // driver-computed probe set becomes a broadcast (query_id, cluster)
    // frame — the same shape as the oracle's `probes` CTE — so the
    // coarse-assignment and PQ-code frames are each scanned once no
    // matter how many queries are batched. nprobe nearest coarse lists
    // per query; ties break to the smaller list id.
    val probes = {
      import df.sparkSession.implicits._
      queryIds.flatMap { qid =>
        val qv = qRows(qid)
        coarseCents.zipWithIndex
          .map { case (c, i) => (sq(qv, c), i) }
          .sorted.take(nprobe)
          .map { case (_, i) => (qid, i.toLong) }
      }.toDF("query_id", "cluster")
    }
    // ADC lookup tables for every (query, codeword), as one literal map
    // per subspace: |Q|·codebook longs, broadcast with the plan.
    val adc = (0 until subspaces).map { s =>
      queryIds.map { qid =>
        val qs = qRows(qid).slice(s * subDim, (s + 1) * subDim)
        qid -> pq(s)._1.map(cw => sq(qs, cw)).toSeq
      }.toMap
    }
    val distCol = (0 until subspaces).map { s =>
      element_at(element_at(typedlit(adc(s)), col("query_id")),
        (col(s"__c$s") + 1).cast("int"))
    }.reduce(_ + _)
    val cands = (0 until subspaces).foldLeft(
      coarseAssign
        .join(broadcast(probes), Seq("cluster"))
        .filter(col(idCol) =!= col("query_id"))
        .select(col("query_id"), col(idCol))) { (d, s) =>
      d.join(pq(s)._2.withColumnRenamed("cluster", s"__c$s"), idCol)
    }
    // per-query top-k via a query-keyed window (parallel across queries),
    // never a global sort
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_dist").asc, col("cand_id").asc)
    cands
      .select(col("query_id"), col(idCol).as("cand_id"), distCol.as("adc_dist"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Build-once IVF-PQ index persisted as versioned snapshots — the
    * companion of [[buildIvfIndex]] for the PQ-compressed regime:
    * [[ivfPqTopK]] refits the coarse quantizer AND all `subspaces`
    * product-quantizer codebooks inside every query, which is the right
    * ORACLE form but defeats the 4× memory shrink PQ exists for (a
    * 100 TB deployment stores the codebooks + per-vector codes once and
    * every query after reads only those artifacts).
    *
    * Layout under `indexRoot` (Sinks commit protocol — `v<N>` dirs with
    * `_SUCCESS`, readable via `readSnapshot`/`readLatestSnapshot`; a
    * rebuild writes a NEW version, so old builds stay probe-able and a
    * crashed build is invisible):
    *   - `codes/v<N>`: (id, list_id, code0..code{S-1}) — the whole
    *     corpus compressed to one coarse list id + S small codes per
    *     vector (the 4× shrink: 64 dims × 8 bytes → S bytes-ish);
    *   - `coarse/v<N>`: (list_id, centroid) — nlist×dim micro-unit
    *     longs, broadcast-size;
    *   - `codebooks/v<N>`: (subspace, code, centroid) — S·codebook
    *     subspace codewords, broadcast-size.
    *
    * All fits are DeterministicKMeans (exact integer micro-units), so a
    * probe of the stored index is bit-identical to [[ivfPqTopK]] with
    * the same parameters — which is what lets the persisted-index query
    * reuse the in-query form's full SQL oracle verbatim. The coarse and
    * subspace fits are independent and run as concurrent Spark jobs.
    */
  def buildIvfPqIndex(
      df: DataFrame, idCol: String, vecCol: String, indexRoot: String,
      version: Long, nlist: Int = 4,
      subspaces: Int = 4, subDim: Int = 16, codebook: Int = 8,
      iters: Int = 2): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val emb = df.select(col(idCol), col(vecCol))
    // The probe re-derives subDim as dim / subspaces from the stored
    // coarse centroids; a build whose subspaces*subDim disagrees with
    // the vector dimension would slice DIFFERENT sub-vectors at build
    // vs probe and return silently wrong ADC distances. Fail the build.
    val dimRow = emb.select(size(col(vecCol))).head(1)
    require(dimRow.nonEmpty,
      "buildIvfPqIndex: embedding input is empty — nothing to index")
    require(!dimRow.head.isNullAt(0),
      s"buildIvfPqIndex: null $vecCol in embedding input")
    val dim = dimRow.head.getInt(0)
    require(subspaces * subDim == dim,
      s"buildIvfPqIndex: subspaces($subspaces) * subDim($subDim) != vector dim($dim)")
    val coarseF = Future(DeterministicKMeans.fit(emb, idCol, vecCol, nlist, iters))
    val pqF = (0 until subspaces).map { s =>
      Future(DeterministicKMeans.fit(
        emb.select(col(idCol),
          expr(s"slice($vecCol, ${s * subDim + 1}, $subDim)").as("sub")),
        idCol, "sub", codebook, iters))
    }
    val (coarseCents, coarseAssign) = Await.result(coarseF, Duration.Inf)
    val pq = pqF.map(Await.result(_, Duration.Inf))
    // one row per vector: coarse list + every subspace code (id-keyed
    // equi-joins of the S+1 assignment frames — each is (id, cluster))
    (0 until subspaces).foldLeft(
        coarseAssign.withColumnRenamed("cluster", "list_id")) { (d, s) =>
        d.join(pq(s)._2.withColumnRenamed("cluster", s"code$s"), idCol)
      }
      .write.mode("overwrite").parquet(s"$indexRoot/codes/v$version")
    import df.sparkSession.implicits._
    coarseCents.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("list_id", "centroid")
      .write.mode("overwrite").parquet(s"$indexRoot/coarse/v$version")
    pq.zipWithIndex
      .flatMap { case ((cents, _), sIdx) =>
        cents.zipWithIndex.map { case (c, i) => (sIdx, i, c.toSeq) }
      }.toSeq.toDF("subspace", "code", "centroid")
      .write.mode("overwrite").parquet(s"$indexRoot/codebooks/v$version")
  }

  /** Probe a persisted IVF-PQ index ([[buildIvfPqIndex]]): route each
    * query to its `nprobe` nearest stored coarse centroids, scan ONLY
    * those lists' stored codes, rank candidates by ADC (per-subspace
    * lookup-table distances derived from the stored codebooks) —
    * quantizer fit happens zero times, full vectors are never read at
    * query time. `asOfVersion` time-travels to an older build. Subspace
    * count and codebook size are read off the stored artifacts, so a
    * probe needs no build-time parameters beyond `nprobe`/`k`.
    *
    * Query vectors come from `queries` (id, vec) — |Q| rows collected
    * driver-side by design (the ADC tables are |Q|·S·codebook longs,
    * broadcast with the plan). Bit-identical to [[ivfPqTopK]] with the
    * same parameters, by the DeterministicKMeans argument above.
    */
  def probeIvfPqIndex(
      indexRoot: String, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int = 2, asOfVersion: Option[Long] = None): DataFrame = {
    val spark = queries.sparkSession
    def rd(sub: String) = asOfVersion match {
      case Some(v) => graft.sources.Sinks.readSnapshot(spark, s"$indexRoot/$sub", v)
      case None => graft.sources.Sinks.readLatestSnapshot(spark, s"$indexRoot/$sub")
    }
    val codes = rd("codes")
    val coarse = rd("coarse").collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).sortBy(_._1)
    val books = rd("codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Long](2).toArray).toMap
    val subspaces = books.keys.map(_._1).max + 1
    val codebook = books.keys.map(_._2).max + 1
    val dim = coarse.head._2.length
    val subDim = dim / subspaces

    val qRows = queries
      .select(col(idCol).cast("long"),
        expr(s"transform($vecCol, x -> cast(round(cast(x as double) * 1000000, 0) as bigint))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val queryIds = qRows.keys.toSeq.sorted
    require(queryIds.nonEmpty, "probeIvfPqIndex: queries must be non-empty")

    def sq(a: Array[Long], b: Array[Long]): Long = {
      var i = 0; var s = 0L
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // nprobe nearest stored coarse lists per query; ties to smaller id —
    // the ivfPqTopK probe rule, verbatim
    val probes = {
      import spark.implicits._
      queryIds.flatMap { qid =>
        val qv = qRows(qid)
        coarse.map { case (i, c) => (sq(qv, c), i) }
          .sorted.take(nprobe)
          .map { case (_, i) => (qid, i) }
      }.toDF("query_id", "list_id")
    }
    // ADC tables against the STORED codebooks
    val adc = (0 until subspaces).map { s =>
      queryIds.map { qid =>
        val qs = qRows(qid).slice(s * subDim, (s + 1) * subDim)
        qid -> (0 until codebook).map(cw => sq(qs, books((s, cw)))).toSeq
      }.toMap
    }
    val distCol = (0 until subspaces).map { s =>
      element_at(element_at(typedlit(adc(s)), col("query_id")),
        (col(s"code$s") + 1).cast("int"))
    }.reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("cand_id").asc)
    codes.join(broadcast(probes), Seq("list_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("cand_id"), distCol.as("adc_dist"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** All vector pairs with cosine >= threshold, through single-table
    * LSH buckets (embedding near-dup).
    */
  def nearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double, planes: Int = 8): DataFrame = {
    CosineSimilarity.register(df.sparkSession)
    val bucketed = df.withColumn("bucket",
      expr(VectorOps.lshBucketSpark(vecCol, dim, planes)))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(expr("graft_cosine(__va, __vb)"), 4))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }
}
