package graft

import org.apache.spark.sql.functions._

/** Invariants for the fifty-first wave (q326-q327): stratified PPS
  * replayed per stratum (with the self-weighting and certainty-
  * selection laws), the sliding sketch gated and its exact witness
  * recounted from raw (day, user) pairs.
  */
class Training51Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q326: per-stratum replay + self-weighting law") {
    val out = q("q326_stratified_pps").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(out.keySet === docs.keySet)
    docs.foreach { case (src, rows) =>
      val ordered = rows.sortBy(_._2)
      val total = ordered.map(_._3).sum
      val step = math.max(total / 16, 1L)
      var cum = 0L
      var nSel = 0L; var wSel = 0L
      ordered.foreach { case (_, _, w) =>
        cum += w
        if (cum / step > (cum - w) / step) { nSel += 1; wSel += w }
      }
      val ppm = (2 * 1000000L * wSel + total) / (2 * total)
      assert(out(src) === ((ordered.size.toLong, nSel, ppm)), s"stratum $src")
      // self-weighting: sampled-weight share ≈ n_sampled/16 of the mass
      assert(nSel >= 1 && nSel <= 17, s"stratum $src selection count $nSel")
    }
  }

  test("q327: gates hold and the exact sliding distinct recounts") {
    val out = q("q327_sliding_hll_distinct").collect()
      .map(r => r.getDate(0).toLocalDate ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.nonEmpty)
    assert(out.values.forall(_._2), "every sliding HLL gate must hold")
    val ev = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = ev.map(_._1).distinct
    days.foreach { d =>
      val lo = d.minusDays(6)
      val exact = ev.filter { case (ed, _) =>
        !ed.isBefore(lo) && !ed.isAfter(d)
      }.map(_._2).distinct.length.toLong
      assert(out(d)._1 === exact, s"window $d exact distinct")
    }
  }
}
