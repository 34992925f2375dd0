package graft

import org.apache.spark.sql.functions._

/** Invariants for the fiftieth wave (q323-q325): SPC rules re-derived
  * with FLOAT sigma arithmetic (different machinery than the integer
  * cross-multiplication), bitmap rollups against plain distinct sets,
  * canonicalization against a JVM URL normalizer.
  */
class Training50Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q323: SPC rules re-derive from float sigma arithmetic") {
    val out = q("q323_spc_rules").collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    val daily = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("day")).collect()
      .groupBy(_.get(0).toString).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val xs = daily.map(_._2.toDouble)
    val mean = xs.sum / xs.length
    val sigma = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.length)
    val sides = xs.map(x => math.signum(x - mean))
    val beyond2 = xs.map(x => if (math.abs(x - mean) > 2 * sigma) math.signum(x - mean) else 0.0)
    daily.zipWithIndex.foreach { case ((day, x), i) =>
      val (gx, r1, r2, r4) = out(day)
      assert(gx === x, s"$day count")
      assert(r1 === (math.abs(x - mean) > 3 * sigma), s"$day rule1")
      val lo3 = math.max(0, i - 2)
      val expR2 =
        (beyond2.slice(lo3, i + 1).count(_ == 1.0) >= 2 && beyond2(i) == 1.0) ||
          (beyond2.slice(lo3, i + 1).count(_ == -1.0) >= 2 && beyond2(i) == -1.0)
      assert(r2 === expR2, s"$day rule2")
      val lo8 = math.max(0, i - 7)
      val win = sides.slice(lo8, i + 1)
      val expR4 = win.length == 8 && (win.forall(_ == 1.0) || win.forall(_ == -1.0))
      assert(r4 === expR4, s"$day rule4")
    }
  }

  test("q324: bitmap rollups equal plain distinct sets per period") {
    val out = q("q324_bitmap_incremental_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).collect()
      .map(r => (r.getDate(0).toLocalDate.getDayOfMonth, r.getLong(1)))
    assert(out("full_month") === ev.map(_._2).distinct.length.toLong)
    assert(out("first_half") === ev.filter(_._1 <= 15).map(_._2).distinct.length.toLong)
    assert(out("second_half") === ev.filter(_._1 > 15).map(_._2).distinct.length.toLong)
    assert(out("first_half") + out("second_half") >= out("full_month"),
      "periods must cover the month")
  }

  test("q325: every document's three variants collapse to one canonical URL") {
    val out = q("q325_url_canonical_dedup").collect()
    assert(out.length === 1, "exactly one variant-multiplicity class")
    val r = out.head
    val nDocs = Tables(spark, dir, "documents").count()
    assert(r.getLong(0) === 3L, "every canonical URL must absorb 3 variants")
    assert(r.getLong(1) === nDocs, "one canonical URL per document")
    assert(r.getLong(2) === nDocs)
    // JVM canonical check on one planted triple
    val id = 7L
    val urls = Seq(
      s"https://EX${id % 5}.COM/p/$id?utm_source=x&id=$id",
      s"https://ex${id % 5}.com:443/p/$id?id=$id#frag",
      s"https://ex${id % 5}.com/p/$id?id=$id&utm_campaign=y")
    val canon = urls.map { u =>
      val uri = java.net.URI.create(u)
      val q0 = Option(uri.getQuery).getOrElse("")
      val qc = q0.split("&").filterNot(_.startsWith("utm_")).mkString("&")
      s"https://${uri.getHost.toLowerCase}${uri.getPath}" +
        (if (qc.nonEmpty) s"?$qc" else "")
    }
    assert(canon.distinct.length === 1, s"JVM canonicalizer disagrees: $canon")
  }
}
