package graft

import org.apache.spark.sql.functions._

/** Invariants for the fourth training-data wave (q115-q120) that the
  * row/hash oracle can't see: the Z-order tile-bound guarantee, chunk
  * coverage arithmetic, salted-vs-plain aggregation identity, and
  * duplicated-span accounting.
  */
class Training4Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q118: every 2^14 z-bucket bounds both dimensions to a 128-wide tile") {
    // a 2^14-aligned range of 20-bit z-values is a 2^7 x 2^7 tile: that
    // bound IS the data-skipping guarantee (min/max stats on EITHER
    // column prune the bucket), so assert it, not just the row hash.
    val rows = q("q118_zorder_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") < 128)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") < 128)
    }
  }

  test("q118: z-interleave matches a bit-by-bit reference on the raw table") {
    def zRef(x: Long, y: Long): Long =
      (0 until 10).map(b => (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).sum
    val li = Tables(spark, dir, "lineitem")
      .select((col("l_partkey") % 1024).as("x"), (col("l_suppkey") % 1024).as("y"))
      .limit(200).collect()
    val buckets = q("q118_zorder_stats").collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("min_x"), r.getAs[Long]("max_x"),
          r.getAs[Long]("min_y"), r.getAs[Long]("max_y"))).toMap
    li.foreach { r =>
      val (x, y) = (r.getAs[Long]("x"), r.getAs[Long]("y"))
      val (lox, hix, loy, hiy) = buckets(zRef(x, y) / 16384)
      assert(x >= lox && x <= hix && y >= loy && y <= hiy)
    }
  }

  test("q116: chunk count and sizes reconstruct each document's length") {
    val lens = Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = q("q116_rag_chunks").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet == lens.keySet)
    chunks.foreach { case (id, cs) =>
      val len = lens(id)
      val expected = 1 + math.max(0L, math.ceil((len - 16) / 12.0).toLong)
      assert(cs.length == expected, s"doc $id: ${cs.length} chunks, want $expected")
      val byIdx = cs.sortBy(_.getAs[Long]("chunk_idx"))
      byIdx.init.foreach(c => assert(c.getAs[Long]("n_tokens") == 16))
      assert(byIdx.last.getAs[Long]("n_tokens") == len - 12 * (expected - 1))
    }
  }

  test("q119: salted two-phase aggregation equals the plain group-by") {
    val plain = Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), Num.dsum(col("l_quantity")).as("sum_qty"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val salted = q("q119_salted_agg").collect()
    assert(salted.length == plain.size)
    salted.foreach { r =>
      val (n, s) = plain(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Double]("sum_qty") == s) // exact: decimal accumulation
    }
  }

  test("q115: window accounting — totals match doc lengths, dups bounded") {
    val out = q("q115_dup_spans").collect()
    val totalWindows = Tables(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 5) // <5-word docs emit none
      .select(sum(size(split(col("text"), " ")) - 4)).collect()(0).getLong(0)
    assert(out.map(_.getAs[Long]("n_windows")).sum == totalWindows)
    out.foreach { r =>
      val (nw, nd, ppm) =
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup"), r.getAs[Long]("dup_ppm"))
      assert(nd >= 0 && nd <= nw)
      assert(ppm >= 0 && ppm <= 1000000)
      assert(ppm == (2 * 1000000 * nd + nw) / (2 * nw))
    }
    // the synthetic corpus repeats phrases across docs — the signal fires
    assert(out.exists(_.getAs[Long]("n_dup") > 0))
  }

  test("q120: winner topic has the (tie-earliest) maximal hit count") {
    val kws = Map(
      "query" -> Set("join", "scan", "sort", "merge", "hash"),
      "streaming" -> Set("stream", "window", "batch", "spark"),
      "storage" -> Set("table", "part", "key", "order"))
    val order = Seq("query", "streaming", "storage")
    val texts = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    q("q120_topic_tag").collect().foreach { r =>
      val words = texts(r.getAs[Long]("doc_id")).split(' ')
      val hits = order.map(t => t -> words.count(kws(t))).toMap
      val best = order.filter(t => hits(t) > 0 && order.forall(o => hits(t) >= hits(o)))
      val expectTopic = best.headOption.getOrElse("untagged")
      assert(r.getAs[String]("topic") == expectTopic)
      assert(r.getAs[Long]("hits") == hits.getOrElse(expectTopic, 0))
    }
  }
}
