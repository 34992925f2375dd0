package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninetieth wave:
  *
  *  - q432: full JVM replay of the grid → lift → top-24 threshold →
  *    inverse pipeline; the transform is exactly invertible when every
  *    coefficient is kept; octant mass is conserved on the exact side;
  *  - q433: JVM replay with an independent Levenshtein DP; every band
  *    the query emits matches the replay and non-links dominate;
  *  - q434: JVM replay of the FTL walk; regret is non-negative by
  *    definition of hindsight best.
  */
class Training90Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  // ---- shared JVM Haar machinery
  private def lift(g: Array[Long]): (Array[Long], Seq[Array[Long]]) = {
    var a = g; val ds = Seq.newBuilder[Array[Long]]
    while (a.length > 1) {
      val s = Array.tabulate(a.length / 2)(i => a(2 * i) + a(2 * i + 1))
      val d = Array.tabulate(a.length / 2)(i => a(2 * i) - a(2 * i + 1))
      ds += d; a = s
    }
    (a, ds.result()) // ds head = finest (lvl 7 for 256 input)
  }
  private def inverse(approx: Array[Long], ds: Seq[Array[Long]]): Array[Long] = {
    var a = approx
    ds.reverse.foreach { d => // coarsest-first
      a = Array.tabulate(a.length * 2) { j =>
        val (i, v) = (j / 2, a(j / 2))
        math.floorDiv(if (j % 2 == 0) v + d(i) else v - d(i), 2)
      }
    }
    a
  }

  test("q432: JVM replay; keep-all reconstruction is exact") {
    val orders = Tables(spark, dir, "orders")
      .selectExpr("CAST(o_orderdate AS STRING)",
        "CAST(round(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (java.time.LocalDate.parse(r.getString(0).take(10)), r.getLong(1)))
    val mind = orders.map(_._1).min(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val maxd = orders.map(_._1).max(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val span = maxd.toEpochDay - mind.toEpochDay + 1
    val g = new Array[Long](256)
    orders.foreach { case (dt, c) =>
      g(((dt.toEpochDay - mind.toEpochDay) * 256 / span).toInt) += c
    }
    val (approx, ds) = lift(g)
    // keep-all invertibility
    assert(inverse(approx, ds).toSeq === g.toSeq)
    // top-24 threshold: rank all details by (|d| desc, lvl, idx)
    val flat = ds.zipWithIndex.flatMap { case (d, i) =>
      val lvl = 7 - i // ds head is the finest level = 7
      d.zipWithIndex.map { case (v, idx) => (lvl, idx, v) }
    }
    val kept = flat.sortBy { case (lvl, idx, v) => (-math.abs(v), lvl, idx) }
      .take(24).map { case (lvl, idx, _) => (lvl, idx) }.toSet
    val thr = ds.zipWithIndex.map { case (d, i) =>
      val lvl = 7 - i
      d.zipWithIndex.map { case (v, idx) => if (kept((lvl, idx))) v else 0L }
    }
    val recon = inverse(approx, thr)
    val want = (0 until 8).map { o =>
      val ex = (o * 32 until (o + 1) * 32).map(g).sum
      val rc = (o * 32 until (o + 1) * 32).map(recon).sum
      (o, ex, rc, math.abs(ex - rc))
    }
    val got = q("q432_haar_synopsis").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
    assert(want.map(_._2).sum === orders.map(_._2).sum) // octant mass conserved
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("q433: JVM Fellegi-Sunter replay; non-links dominate") {
    def m(x: Double) = math.round(math.log(x) * 1e6)
    val parts = Tables(spark, dir, "part")
      .selectExpr("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "CAST(round(p_retailprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4), r.getLong(5)))
    val scores = for {
      a <- parts; b <- parts
      if a._2.take(2) == b._2.take(2) && a._3 == b._3 &&
        math.abs(a._5 - b._5) <= 1 && a._1 < b._1
    } yield {
      val na = lev(a._2, b._2) <= 4
      val s = (if (na) m(0.95 / 0.05) else m(0.05 / 0.95)) +
        (if (a._4 == b._4) m(0.90 / 0.05) else m(0.10 / 0.95)) +
        (if (a._5 == b._5) m(0.85 / 0.30) else m(0.15 / 0.70)) +
        (if (math.abs(a._6 - b._6) <= 2000) m(0.80 / 0.02) else m(0.20 / 0.98))
      (s, na)
    }
    val want = scores.groupBy { case (s, _) =>
      if (s >= 5000000L) "link" else if (s >= 0) "possible" else "non_link"
    }.map { case (band, xs) =>
      (band, xs.length.toLong, xs.map(_._1).sum, xs.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    val got = q("q433_fellegi_sunter_linkage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
    val byBand = got.map(x => x._1 -> x._2).toMap
    assert(byBand.getOrElse("non_link", 0L) > byBand.getOrElse("link", 0L),
      s"blocking should leave mostly non-links: $byBand")
  }

  test("q434: JVM FTL walk replay; regret non-negative") {
    val events = Tables(spark, dir, "events")
      .selectExpr("event_type", "CAST(to_date(ts) AS STRING)",
        "CAST(round(value * 1000000, 0) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val arms = events.map(_._1).distinct.sorted
    val days = events.map(_._2).distinct.sorted
    val reward = events.groupBy(e => (e._1, e._2))
      .map { case (k, xs) => k -> xs.map(_._3).sum }.withDefaultValue(0L)
    val cum = scala.collection.mutable.Map(arms.map(_ -> 0L): _*)
    var ftl = 0L; var changes = 0L; var prevLeader: String = null
    days.foreach { day =>
      val lead2 = arms.sortBy(a => (-cum(a), a)).head
      ftl += reward((lead2, day))
      if (prevLeader != null && prevLeader != lead2) changes += 1
      prevLeader = lead2
      arms.foreach(a => cum(a) += reward((a, day)))
    }
    val bestArm = arms.sortBy(a => (-cum(a), a)).head
    val best = cum(bestArm)
    val got = q("q434_ftl_expert_replay").collect().head
    assert(got.getLong(0) === days.length.toLong)
    assert(got.getLong(1) === ftl)
    assert(got.getString(2) === bestArm)
    assert(got.getLong(3) === best)
    assert(got.getLong(4) === best - ftl)
    assert(got.getLong(5) === changes)
    assert(got.getLong(4) >= 0L, "hindsight-best regret is non-negative")
  }
}
