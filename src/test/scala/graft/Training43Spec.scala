package graft

import org.apache.spark.sql.functions._

/** Invariants for the forty-third wave (q297-q300), each re-derived
  * INDEPENDENTLY in the JVM (different algebraic path than the query —
  * the shared-formula-blind-spot discipline):
  *
  *  - q297's Otsu thresholds recomputed from raw PIXELS (no histogram,
  *    no prefix sums), exhaustively over all (n0, n1) splits;
  *  - q298's audio features recomputed from the closed-form samples;
  *  - q299's Holt recurrence checked via BigDecimal HALF_UP (different
  *    rounding machinery) plus the output's own cross-row consistency;
  *  - q300's bag multiplicities recounted from collected multisets.
  */
class Training43Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q297: Otsu threshold re-derives from raw pixels") {
    val out = q("q297_bmp_otsu").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    // several size classes incl. the degenerate 1x1 (doc_id % 35 == 0)
    out.keys.toSeq.sorted.take(40).foreach { id =>
      val did = id % 1000000L
      val w = (1L + id % 7L).toInt
      val h = (1L + id % 5L).toInt
      val grays = for (y <- 0 until h; x <- 0 until w) yield (
        ((did + 3L * x + 7L * y) % 256L
          + (2L * did + 5L * x + y) % 256L
          + (3L * did + x + 11L * y) % 256L) / 3L).toInt
      val n = grays.size.toLong
      val sAll = grays.map(_.toLong).sum
      // independent argmax: filter pixels per threshold, no prefix sums
      var bestT = 0; var bestScore = -1L
      for (t <- 0 to 254) {
        val lo = grays.filter(_ <= t)
        val n0 = lo.size.toLong
        val s0 = lo.map(_.toLong).sum
        val score =
          if (n0 == 0 || n0 == n) -1L
          else {
            val dd = s0 * (n - n0) - (sAll - s0) * n0
            dd * dd * 1000000L / (n0 * (n - n0))
          }
        if (score > bestScore) { bestScore = score; bestT = t }
      }
      val (gotT, gotBg, gotFg) = out(id)
      assert(gotT === bestT, s"doc $id threshold")
      assert(gotBg === grays.count(_ <= bestT).toLong, s"doc $id n_bg")
      assert(gotFg === n - grays.count(_ <= bestT), s"doc $id n_fg")
    }
    // degenerate single-pixel images must take t=0
    out.keys.filter(id => id % 7 == 0 && id % 5 == 0).foreach { id =>
      assert(out(id)._1 === 0, s"1x1 doc $id must threshold at 0")
    }
  }

  test("q298: audio features re-derive from the closed-form samples") {
    val out = q("q298_wav_features").collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5)))).toMap
    assert(out.nonEmpty)
    out.keys.toSeq.sorted.take(40).foreach { id =>
      val did = id % 1000000L
      val n = (8 + did % 9).toInt
      val samples = Array.tabulate(n)(i =>
        (did * 7 + 3L * i * i + (i * did % 17) * 100) % 2001 - 1000)
      val zc = (1 until n).count(i =>
        (samples(i) > 0 && samples(i - 1) < 0) ||
          (samples(i) < 0 && samples(i - 1) > 0))
      assert(out(id) === ((n, 8000, samples.map(s => s * s).sum,
        zc, samples.map(math.abs).max.toInt)), s"doc $id features")
    }
  }

  test("q299: Holt recurrence via BigDecimal HALF_UP + cross-row consistency") {
    val rows = q("q299_holt_linear").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length > 2)
    def hu(x: BigDecimal): Long =
      (x / 2).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    var l = rows.head._1 * 1000000L
    var b = 0L
    assert(rows.head._2 === l && rows.head._3 === 0L && rows.head._4 === l)
    rows.drop(1).foreach { case (y, gl, gb, gf) =>
      val f = l + b
      assert(gf === f, "forecast must be prev level + prev trend")
      val nl = hu(BigDecimal(y) * 1000000 + f)
      val nb = hu(BigDecimal(b) + nl - l)
      assert(gl === nl && gb === nb, "Holt update mismatch")
      l = nl; b = nb
    }
  }

  test("q299: constant series converges to level=y, trend=0") {
    import spark.implicits._
    // synthetic check of the recurrence itself on a constant series
    def halfUp2(x: Long): Long = if (x >= 0) (x + 1) / 2 else -((-x + 1) / 2)
    var l = 5000000L; var b = 0L
    (1 to 10).foreach { _ =>
      val nl = halfUp2(5000000L + l + b)
      val nb = halfUp2(b + nl - l)
      l = nl; b = nb
    }
    assert(l === 5000000L && b === 0L)
  }

  test("q300: bag multiplicities recount from collected multisets") {
    val out = q("q300_bag_set_ops").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val o = Tables(spark, dir, "orders")
    val a = o.filter(col("o_orderdate").cast("date") <
        lit("1997-01-01").cast("date"))
      .select("o_orderpriority").collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val b = o.filter(col("o_custkey") % 3 === 0)
      .select("o_orderpriority").collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    (a.keySet ++ b.keySet).foreach { pri =>
      val inter = math.min(a.getOrElse(pri, 0L), b.getOrElse(pri, 0L))
      val exc = math.max(0L, a.getOrElse(pri, 0L) - b.getOrElse(pri, 0L))
      if (inter > 0 || exc > 0)
        assert(out(pri) === ((inter, exc)), s"priority $pri multiplicities")
    }
    assert(out.values.exists(_._1 > 0) && out.values.exists(_._2 > 0),
      "both bag branches must be exercised")
  }
}
