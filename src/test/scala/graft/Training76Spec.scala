package graft

import org.apache.spark.sql.functions._

/** Invariants for the seventy-sixth wave:
  *
  *  - q394: silhouette re-derives from JvmRef.kmeans (the from-scratch
  *    Lloyd's) + JVM sqrt/rounding, and scores lie in [-1000, 1000];
  *  - q395: edit distances re-derive via a JVM DP (independent of both
  *    engines' levenshtein), including fixture strings;
  *  - q396: the summary bound is structural (inner ≤ exact ≤
  *    inner+partial) on MANY windows, not just the declared one, and
  *    the declared row re-derives from a JVM percentile replica.
  */
class Training76Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q394: silhouette re-derives from the from-scratch Lloyd's") {
    val rows = Tables(spark, dir, "embeddings").selectExpr("vec_id",
      "transform(embedding, x -> cast(round(cast(x as double) * 1000000, 0) as bigint))")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    val (cents, _) = JvmRef.kmeans(rows, k = 8, iters = 5)
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val per = rows.map { case (_, v) =>
      val ds = cents.zipWithIndex.map { case (c, i) => (sq(v, c), i) }
        .sortBy { case (dd, i) => (dd, i) }
      val ia = math.sqrt(ds(0)._1.toDouble).floor.toLong
      val ib = math.sqrt(ds(1)._1.toDouble).floor.toLong
      val s = if (ib == 0) 0L else (2000 * (ib - ia) + ib) / (2 * ib)
      (ds(0)._2.toLong, s)
    }
    val want = per.groupBy(_._1).view.mapValues { g =>
      val n = g.size.toLong
      (n, (2 * g.map(_._2).sum + n) / (2 * n))
    }.toMap
    val got = q("q394_kmeans_silhouette").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    got.values.foreach { case (_, s) =>
      assert(s >= -1000 && s <= 1000, "silhouette must be in [-1, 1] milli")
    }
  }

  test("q395: edit distances re-derive via an independent JVM DP") {
    def lev(a: String, b: String): Long = {
      val dp = Array.tabulate(b.length + 1)(_.toLong)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i.toLong
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    assert(lev("kitten", "sitting") === 3L && lev("", "abc") === 3L &&
      lev("vcp", "vcp") === 0L)
    val seqs = Tables(spark, dir, "events").selectExpr("user_id",
      "unix_micros(ts)", "event_id",
      """CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
         WHEN 'purchase' THEN 'p' ELSE 'e' END""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).view.mapValues { g =>
        g.sortBy(r => (r._2, r._3)).map(_._4).mkString.take(500)
      }.toMap
    val want = seqs.keys.filter(u => u % 2 == 0 && seqs.contains(u + 1))
      .toSeq.sorted.map { u =>
        (u, u + 1, lev(seqs(u), seqs(u + 1)))
      }
    val got = q("q395_sequence_edit_distance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq === want)
    assert(got.nonEmpty)
  }

  test("q396: the bound is structural across many windows; declared row re-derives") {
    val vs = Tables(spark, dir, "lineitem")
      .selectExpr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
      .collect().map(_.getLong(0)).sorted
    // Spark `percentile` replica: linear interpolation at p*(n-1)
    def pct(p: Double): Double = {
      val pos = p * (vs.length - 1)
      val lo = pos.floor.toInt; val f = pos - lo
      val raw =
        if (lo + 1 < vs.length) vs(lo) * (1 - f) + vs(lo + 1) * f
        else vs(lo).toDouble
      java.math.BigDecimal.valueOf(raw)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val bs = (1 to 63).map(i => pct(i / 64.0))
    def slabOf(x: Double): Int = bs.count(x > _)
    val counts = vs.groupBy(v => slabOf(v.toDouble)).view
      .mapValues(_.length.toLong).toMap
    def answer(lo: Double, hi: Double): (Long, Long, Long, Long) = {
      val (sl, sh) = (slabOf(lo), slabOf(hi))
      val inner = counts.collect {
        case (s0, n) if s0 > sl && s0 < sh => n }.sum
      val partial = counts.collect {
        case (s0, n) if s0 == sl || s0 == sh => n }.sum
      val exact = vs.count(v => v >= lo && v <= hi).toLong
      (inner, partial, inner + (partial + 1) / 2, exact)
    }
    // structural bound on a sweep of windows
    val step = (vs.last - vs.head) / 10
    for (i <- 0 until 9; j <- (i + 1) to 9) {
      val (inner, partial, _, exact) =
        answer(vs.head + i * step, vs.head + j * step)
      assert(inner <= exact && exact <= inner + partial,
        s"window [$i,$j]: inner=$inner exact=$exact partial=$partial")
    }
    val (_, partial0, est0, exact0) = answer(2000000.0, 6000000.0)
    val r = q("q396_histogram_answering").collect().head
    assert(r.getLong(0) === exact0 && r.getLong(1) === est0)
    assert(r.getLong(3) === partial0 && r.getBoolean(4))
  }
}
