package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninth wave (q156-q157) beyond the row/hash
  * oracle: HLL union must equal the single-pass sketch (true
  * mergeability, not merely "close"), and the Benford table must be a
  * complete, conserving distribution whose expected masses are the
  * real log10 values.
  */
class Training9Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q156: merged daily sketches estimate EXACTLY like one global sketch") {
    // mergeability identity: union of per-day sketches == sketch of the
    // union — same registers, same estimate, not just within the bound
    val ev = Tables(spark, dir, "events").select(col("event_type"), col("user_id"),
      date_trunc("day", col("ts")).cast("date").as("day"))
    val merged = ev.groupBy("event_type", "day")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_merged"))
    val global = ev.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est_global"))
    val joined = merged.join(global, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("est_merged") == r.getAs[Long]("est_global"),
        r.getAs[String]("event_type"))
    }
    val rows = q("q156_hll_merge").collect()
    assert(rows.forall(_.getAs[Boolean]("merged_ok")))
    assert(rows.forall(_.getAs[Long]("n_days") > 1)) // non-vacuous merge
  }

  test("q157: digit table conserves mass and expected ppm are true log10 values") {
    val rows = q("q157_benford").collect()
    val digits = rows.map(_.getAs[Long]("digit")).sorted
    assert(digits.forall(d => d >= 1 && d <= 9))
    val totalObs = rows.map(_.getAs[Long]("n_obs")).sum
    assert(totalObs == Tables(spark, dir, "lineitem").count())
    // obs_ppm sums to 1e6 within per-row half-up rounding slack
    val ppmSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(math.abs(ppmSum - 1000000L) <= rows.length, s"ppmSum $ppmSum")
    rows.foreach { r =>
      val d = r.getAs[Long]("digit").toInt
      val expected = math.round(math.log10(1.0 + 1.0 / d) * 1000000)
      assert(r.getAs[Long]("exp_ppm") == expected, s"digit $d")
      assert(r.getAs[Long]("dev_ppm") ==
        math.abs(r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm")))
    }
  }

  test("q158: Hill alpha matches a JVM recount over the same top-k tail") {
    val r = q("q158_hill_tail").collect().head
    val degrees = Tables(spark, dir, "lineitem")
      .groupBy("l_suppkey").agg(countDistinct("l_partkey").as("degree"))
      .collect().map(x => (x.getAs[Long]("l_suppkey"), x.getAs[Long]("degree")))
      .sortBy(t => (-t._2, t._1)).take(50).map(_._2)
    val xMin = degrees.min
    val denom = degrees.map(x =>
      math.round(math.log(x.toDouble / xMin.toDouble) * 1000000)).sum
    assert(r.getAs[Long]("k") == degrees.length)
    assert(r.getAs[Long]("x_min") == xMin)
    assert(r.getAs[Long]("denom_micro") == denom)
    if (denom > 0) {
      val alphaMilli = (2 * (degrees.length - 1) * 1000000000L + denom) / (2 * denom)
      assert(r.getAs[Long]("alpha_milli") == alphaMilli)
      assert(alphaMilli > 0)
    }
  }

  test("q159: fertility conserves tokens and chars against a direct recount") {
    val rows = q("q159_fertility").collect()
    assert(rows.nonEmpty)
    val docs = Tables(spark, dir, "documents").select("text").collect()
    val totTokens = docs.map(_.getString(0).split(" ", -1).length.toLong).sum
    val totChars = docs.map(_.getString(0).length.toLong).sum
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totTokens)
    assert(rows.map(_.getAs[Long]("n_chars")).sum == totChars)
    rows.foreach { r =>
      val expect = (2 * 1000000 * r.getAs[Long]("n_tokens") + r.getAs[Long]("n_chars")) /
        (2 * r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("tok_per_char_ppm") == expect)
    }
  }

  test("q160: MI matches a JVM contingency recount and is near zero for independent data") {
    val r = q("q160_mutual_information").collect().head
    val pairs = Tables(spark, dir, "documents").select("source", "lang").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = pairs.length.toLong
    val cells = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cx = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cy = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val s = cells.map { case ((src, lg), cxy) =>
      cxy * math.round(math.log(
        (cxy.toDouble * n) / (cx(src).toDouble * cy(lg))) * 1000000)
    }.sum
    val expected =
      if (s >= 0) (2 * 1000 * s + n) / (2 * n) else -((2 * 1000 * (-s) + n) / (2 * n))
    assert(r.getAs[Long]("n_cells") == cells.size)
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("mi_nano") == expected)
    // source and lang are drawn independently in the harness corpus —
    // MI must sit well under 0.1 nats (1e8 nano-nats)
    assert(math.abs(r.getAs[Long]("mi_nano")) < 100000000L)
  }

  test("q161: anomaly flags match a JVM median/MAD recount") {
    val rows = q("q161_anomaly_days").collect()
    assert(rows.nonEmpty)
    def median2(xs: Seq[Long]): Long = { // 2x the interpolated median
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, g) =>
      val xs = g.map(_.getAs[Long]("x")).toSeq
      val med2 = median2(xs)
      val mad4 = median2(xs.map(x => math.abs(2 * x - med2)))
      g.foreach { r =>
        val devHalf = math.abs(2 * r.getAs[Long]("x") - med2)
        assert(r.getAs[Boolean]("is_anomaly") == (10000L * devHalf > 22239L * mad4))
      }
    }
    // every (type, day) of the source appears exactly once
    assert(rows.map(r => (r.getAs[String]("event_type"), r.get(1))).distinct.length
      == rows.length)
  }

  test("q162: per-hour lags match a JVM last-prior-view recount") {
    val rows = q("q162_conversion_lag").collect()
      .map(r => r.getAs[Int]("hr") ->
        (r.getAs[Long]("n"), r.getAs[Long]("med_us"), r.getAs[Long]("p90_us"))).toMap
    assert(rows.nonEmpty)
    val ev = Tables(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id", "event_type",
        "hour(ts) AS hr").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"), r.getAs[Int]("hr")))
    val lags = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._2, e._3))
      var lastView = Option.empty[Long]
      sorted.flatMap { e =>
        val out =
          if (e._4 == "purchase") lastView.map(v => (e._5, e._2 - v)) else None
        if (e._4 == "view") lastView = Some(e._2)
        out
      }
    }.filter(l => l._2 > 0 && l._2 <= 604800000000L).toSeq
    def pct(xs: Seq[Long], p: Double): Long = {
      // Spark's Percentile interpolation: lower·(1−d) + higher·d — the
      // exact FP association matters for round-to-integer parity
      val s = xs.sorted
      val pos = (s.length - 1) * p
      val lo = pos.toInt
      val d = pos - lo
      val v =
        if (lo + 1 < s.length) s(lo) * (1.0 - d) + s(lo + 1) * d else s(lo).toDouble
      math.round(v)
    }
    lags.groupBy(_._1).foreach { case (hr, g) =>
      val xs = g.map(_._2).toSeq
      val (n, med, p90) = rows(hr)
      assert(n == xs.length, s"hr $hr")
      assert(med == pct(xs, 0.5), s"hr $hr median")
      assert(p90 == pct(xs, 0.9), s"hr $hr p90")
    }
  }

  test("q163: the variant path returns exactly what string JSON parsing returns") {
    val variant = q("q163_variant_json")
    val viaString = Tables(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"), expr("k % 7").as("k_mod7"))
      .agg(count(lit(1)).as("n"), min("k").as("k_min"), max("k").as("k_max"))
    assert(variant.exceptAll(viaString).count() == 0)
    assert(viaString.exceptAll(variant).count() == 0)
    assert(variant.count() > 0)
  }

  test("q164: digest is partition/order-invariant and sensitive to a dropped row") {
    import graft.operators.TextOps.hash60Spark
    val r = q("q164_table_digest").collect().head
    val rowStr = """concat_ws('|',
      CAST(l_orderkey AS STRING), CAST(l_partkey AS STRING),
      CAST(l_suppkey AS STRING),
      CAST(CAST(round(l_quantity * 100, 0) AS BIGINT) AS STRING),
      CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS STRING))"""
    val hashed = Tables(spark, dir, "lineitem")
      .select(expr(hash60Spark(rowStr)).as("h"))
    def digestOf(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val x = df.agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("d")).collect().head
      (x.getAs[Long]("n"), x.getAs[Long]("d"))
    }
    // invariance: any repartitioning/order yields the identical digest
    for (parts <- Seq(1, 7, 32)) {
      assert(digestOf(hashed.repartition(parts)) ==
        (r.getAs[Long]("n_rows"), r.getAs[Long]("digest")), s"parts $parts")
    }
    // sensitivity: dropping one row flips the digest by that row's hash
    val firstHash = hashed.limit(1).collect().head.getAs[Long]("h")
    val (nDrop, dDrop) = digestOf(hashed.exceptAll(hashed.limit(1)))
    assert(nDrop == r.getAs[Long]("n_rows") - 1)
    assert(dDrop == (r.getAs[Long]("digest") ^ firstHash))
  }

  test("q165: degree orientation counts the same triangles as q143 within the √(2m) bound") {
    val a = q("q165_triangle_degree").collect().head
    val b = q("q143_triangle_count").collect().head
    assert(a.getAs[Long]("n_triangles") == b.getAs[Long]("n_triangles"))
    assert(a.getAs[Long]("n_edges") == b.getAs[Long]("n_edges"))
    // the whole point of the orientation: no node emits more than
    // ~√(2m) edges, whatever the degree distribution does
    val m = a.getAs[Long]("n_edges").toDouble
    assert(a.getAs[Long]("max_outdeg") <= math.ceil(math.sqrt(2 * m)).toLong + 1)
  }

  test("q165: forced-limit dispatch routes sampled and agrees with q143's estimator") {
    // wedgeMassLimit = 0 forces BOTH q165 and q143 onto the DOULION
    // branch; they count exact triangles of the SAME deterministic
    // 1-in-p sampled subgraph under different orientations, so the
    // rescaled estimates must be IDENTICAL — and must differ from the
    // exact count only within the estimator's tolerance
    val exact = q("q165_triangle_degree").collect().head.getAs[Long]("n_triangles")
    spark.conf.set("spark.graft.graph.wedgeMassLimit", "0")
    try {
      val a = q("q165_triangle_degree").collect().head
      val b = q("q143_triangle_count").collect().head
      assert(a.getAs[Long]("n_triangles") === b.getAs[Long]("n_triangles"))
      // n_edges / max_outdeg stay exact from the full orientation
      assert(a.getAs[Long]("n_edges") ===
        q("q143_triangle_count").collect().head.getAs[Long]("n_edges"))
      val est = a.getAs[Long]("n_triangles").toDouble
      assert(math.abs(est - exact) <= math.max(0.5 * exact, 200.0),
        s"sampled estimate $est vs exact $exact")
    } finally spark.conf.unset("spark.graft.graph.wedgeMassLimit")
  }

  test("q165: on a planted hub, degree orientation does orders-of-magnitude fewer wedges") {
    // wedge count (Σ out-degree choose 2) is the join's actual row
    // budget — a deterministic complexity witness, unlike wall clock.
    // Hub node 0 connects to 1..400: id-orientation (u<v) makes the
    // hub emit ALL its edges (C(400,2) wedges); degree orientation
    // makes it absorb them (0 hub wedges).
    import spark.implicits._
    val hub = (1L to 400L).map(i => (0L, i))
    val ring = (1L to 399L).map(i => (i, i + 1))
    val e = (hub ++ ring).toDF("u", "v")
    def wedges(oriented: org.apache.spark.sql.DataFrame): Long =
      oriented.groupBy("s").agg(count(lit(1)).as("od"))
        .agg(sum(expr("od * (od - 1) div 2")).as("w")).collect().head.getAs[Long]("w")
    val idOriented = e.select(col("u").as("s"), col("v").as("t"))
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val degOriented = e
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("dg", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("dg", "dv"), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("t"))
    val wId = wedges(idOriented)
    val wDeg = wedges(degOriented)
    assert(wId >= 400L * 399L / 2) // the hub alone
    assert(wDeg * 100 < wId, s"degree-oriented wedges $wDeg vs id-oriented $wId")
  }
}
