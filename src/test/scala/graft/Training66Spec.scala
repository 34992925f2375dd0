package graft

import org.apache.spark.sql.functions._

/** Invariants for the sixty-sixth wave:
  *
  *  - q366: all three inertias re-derive from the from-scratch JVM
  *    Lloyd's ([[JvmRef.kmeans]]), inertia is non-increasing in k, and
  *    the selection rule re-derives;
  *  - q367: per-doc VAD censuses re-derive from the closed-form
  *    samples WITHOUT the codec (so codec round-trip bugs can't hide),
  *    and both active and silent frames fire;
  *  - q368: census equals 2× the base table per type (the in-window
  *    drop AND post-eviction re-admission both measured).
  */
class Training66Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q366: inertias re-derive from JVM Lloyd's; selection rule holds") {
    val rows = Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000000, 0) as bigint))"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    def inertia(k: Int): Long = {
      val (cents, _) = JvmRef.kmeans(rows, k, iters = 2)
      rows.map { case (_, v) =>
        cents.map(c => JvmRef.sqDist(v, c)).min / 1000000L
      }.sum
    }
    val want = Seq(2, 4, 8).map(k => k -> inertia(k)).toMap
    val got = q("q366_kmeans_model_selection").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(r => r._1 -> r._2).toMap === want)
    assert(want(2) >= want(4) && want(4) >= want(8), "inertia not monotone")
    val floor = want(8)
    val selK = Seq(2, 4, 8).find(k => want(k) * 10 <= floor * 11).get
    assert(got.filter(_._3).map(_._1) === Seq(selK))
  }

  test("q367: VAD censuses re-derive from closed-form samples, both frame kinds fire") {
    val ids = Tables(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val want = ids.map { id =>
      val did = id % 1000000L
      val n = (32 + did % 33).toInt
      val sl = Array.tabulate(n)(i =>
        (did * 7 + 3L * i * i + (i * did % 17) * 100) % 2001 - 1000)
      val nf = n / 4
      val act = (0 until nf).map(f =>
        (0 until 4).map(j => sl(4 * f + j) * sl(4 * f + j)).sum >= 1500000L)
      var nA = 0L; var nS = 0L; var mx = 0L; var run = 0L
      act.foreach { a =>
        if (a) { nA += 1; run += 1; if (run == 1) nS += 1; mx = math.max(mx, run) }
        else run = 0
      }
      id -> ((nf.toLong, nA, nS, mx))
    }.toMap
    val got = q("q367_wav_vad_segments").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
    assert(got.values.exists(_._2 > 0), "no active frames anywhere")
    assert(got.values.exists(v => v._2 < v._1), "no silent frames anywhere")
    assert(got.values.exists(_._4 > 1), "no multi-frame segment fired")
  }

  test("q368: census is exactly 2x the base per type") {
    val base = Tables(spark, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = q("q368_stream_dedup_within_watermark").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === base.keySet)
    got.foreach { case (t, (rows, ids)) =>
      assert(rows === 2 * base(t), s"$t rows")
      assert(ids === base(t), s"$t ids")
    }
  }
}
