package graft

import org.apache.spark.sql.functions._

/** Invariants for the eighty-ninth wave:
  *
  *  - q429: full JVM replay of the exponential-clock selection (md5 →
  *    u → micro-nat clock → top-500), plus the weighted-sampling
  *    property: the sample over-represents heavy orders;
  *  - q430: full JVM replay of both ring assignments; the consistent-
  *    hashing theorem — keys only move TO the new shard — and the
  *    moved fraction is near the new shard's vnode share (1/9);
  *  - q431: per-arm JVM walk replay of the SPRT decision; both
  *    decision branches fire across the five arms.
  */
class Training89Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h60(x: String): Long =
    java.lang.Long.parseLong(md5hex(x).take(15), 16)

  test("q429: JVM replay of the clock top-500; heavy orders over-represented") {
    val orders = Tables(spark, dir, "orders")
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val scored = orders.map { case (k, cents) =>
      val u = ((h60(s"wrs:$k") % 1000000L) + 1L) / 1000001.0
      val lmicro = math.round(-math.log(u) * 1e6)
      (k, cents, lmicro * 1000000L / cents)
    }
    val want = scored.sortBy { case (k, _, c) => (c, k) }.take(500)
    val got = q("q429_weighted_reservoir_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
    val sampleMean = want.map(_._2).sum.toDouble / want.length
    val corpusMean = orders.map(_._2).sum.toDouble / orders.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("q430: JVM ring replay; keys move ONLY to the new shard; ~1/9 move") {
    def ringOf(shards: Int): Seq[(Long, Int)] =
      (for { s <- 0 until shards; v <- 0 until 16 }
        yield (h60(s"ring:$s:$v") % 4294967296L, s)).sortBy(_._1)
    def owner(ring: Seq[(Long, Int)], kpos: Long): Int =
      ring.find(_._1 > kpos).getOrElse(ring.head)._2
    val (ra, rb) = (ringOf(8), ringOf(9))
    val keys = Tables(spark, dir, "orders").select("o_orderkey")
      .collect().map(r => h60(s"key:${r.getLong(0)}") % 4294967296L)
    val assigned = keys.map(k => (owner(ra, k), owner(rb, k)))
    val want = assigned.groupBy(_._2).toSeq.sortBy(_._1).map { case (s, xs) =>
      (s, xs.length.toLong, xs.count { case (a, b) => a != b }.toLong)
    }
    val got = q("q430_consistent_hash_ring").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want)
    // the defining theorem: pre-existing shards gain nothing
    got.filter(_._1 < 8).foreach { case (s, _, gained) =>
      assert(gained === 0L, s"shard $s gained keys on ring growth")
    }
    val row8 = got.find(_._1 === 8).get
    assert(row8._3 === row8._2, "every key on the new shard is a moved key")
    val movedFrac = row8._3.toDouble / keys.length
    assert(movedFrac > 0.04 && movedFrac < 0.20,
      s"moved fraction $movedFrac should be near 1/9")
    assert(got.map(_._2).sum === keys.length.toLong)
  }

  test("q431: JVM SPRT walk replay; both decision branches fire") {
    val sInc = math.round(math.log(0.6 / 0.5) * 1e6)
    val fInc = math.round(math.log(0.4 / 0.5) * 1e6)
    val a = math.round(math.log(0.95 / 0.05) * 1e6)
    val events = Tables(spark, dir, "events")
      .selectExpr("event_type", "CAST(ts AS STRING)", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = events.groupBy(_._1).toSeq.sortBy(_._1).map { case (arm, xs) =>
      val p = if (arm.length % 2 == 0) 60 else 50
      val incs = xs.sortBy { case (_, ts, id) => (ts, id) }
        .map { case (_, _, id) => if (h60(s"sprt:$id") % 100 < p) sInc else fInc }
      var cum = 0L; var n = 0; var hit = 0
      val it = incs.iterator
      while (it.hasNext && hit == 0) {
        cum += it.next(); n += 1
        if (cum >= a || cum <= -a) hit = n
      }
      val nUsed = if (hit > 0) hit else incs.length
      val llr = incs.take(nUsed).sum
      val dec = if (llr >= a) "reject_h0"
        else if (llr <= -a) "accept_h0" else "continue"
      (arm, dec, nUsed.toLong, llr)
    }
    val got = q("q431_sprt_sequential_test").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
    val decisions = got.map(_._2).toSet
    assert(decisions.contains("reject_h0"), s"no arm rejected H0: $decisions")
    assert(decisions.contains("accept_h0"), s"no arm accepted H0: $decisions")
  }
}
