package graft

import org.apache.spark.sql.functions._

/** Invariants for the sixty-third wave:
  *
  *  - q355: the distributed prefix-sum concurrency equals a direct JVM
  *    global-sort replay (single sorted pass — the form the
  *    distributed scan replaces);
  *  - q356: the chained streaming rollup equals the batch double
  *    rollup recomputed in the JVM;
  *  - q357: allocation sums EXACTLY to the budget and matches a JVM
  *    Hamilton replay;
  *  - q358: the TA certificate is honored — when ta_certified, the
  *    answer must equal the brute-force full-corpus top-k (the claim
  *    the certificate makes).
  */
class Training63Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  private val gapUs = 1800000000L

  test("q355: distributed scan equals direct JVM global-sort concurrency") {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val deltas = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ts = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val sessions = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var st = ts.head; var en = ts.head
      ts.tail.foreach { t =>
        if (t - en > gapUs) { sessions += ((st, en)); st = t }
        en = t
      }
      sessions += ((st, en))
      sessions.flatMap { case (a, b) => Seq((a, 1L, u), (b, -1L, u)) }
    }
    // direct global sort: (tus, delta desc, user)
    val sorted = deltas.sortBy { case (t, dl, u) => (t, -dl, u) }
    var rs = 0L
    val perDay = scala.collection.mutable.Map[String, (Long, Long)]()
    sorted.foreach { case (t, dl, _) =>
      rs += dl
      val day = java.time.Instant.ofEpochSecond(t / 1000000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      val (p, n) = perDay.getOrElse(day, (Long.MinValue, 0L))
      perDay(day) = (math.max(p, rs), n + (if (dl == 1) 1 else 0))
    }
    val got = q("q355_peak_concurrency").collect()
      .map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === perDay.toMap)
  }

  test("q356: chained streaming rollup equals the batch double rollup") {
    val got = q("q356_stream_two_level_window").collect()
      .map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    val hourly = Tables(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val want = hourly
      .groupBy(to_date(date_trunc("day", col("h"))).as("day"))
      .agg(count(lit(1)).as("g"), max("n").as("m"))
      .collect().map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === want)
    assert(got.size > 1, "needs multiple closed daily windows")
  }

  test("q357: allocation sums to the budget and matches a JVM Hamilton replay") {
    val rows = q("q357_largest_remainder_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum === 1000000L)
    val tot = rows.map(_._2).sum
    val quotas = rows.map { case (l, c, _) =>
      (l, 1000000L * c / tot, 1000000L * c % tot)
    }
    val left = 1000000L - quotas.map(_._2).sum
    val bump = quotas.sortBy { case (l, _, r) => (-r, l) }.take(left.toInt)
      .map(_._1).toSet
    val want = quotas.map { case (l, qv, _) =>
      l -> (qv + (if (bump(l)) 1L else 0L))
    }.toMap
    assert(rows.map(r => r._1 -> r._3).toMap === want)
  }

  test("q358: certificate honored — certified answer equals brute-force top-k") {
    val out = q("q358_threshold_algorithm_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === 10)
    assert(out.forall(_._3), "budget m=50 must certify on harness data")
    val brute = Tables(spark, dir, "documents")
      .select("doc_id", "n_chars", "text").collect()
      .map { r =>
        val words = r.getString(2).split(" ").filter(_.nonEmpty).distinct.length
        (r.getLong(0), r.getLong(1) + 100L * words)
      }
      .sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    assert(out.map(r => (r._1, r._2)).toSeq === brute)
  }
}
