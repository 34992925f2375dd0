package graft

import org.apache.spark.sql.functions._

/** Planted-pathology guards for the round-10 quadratic closures: the
  * market-basket family (q403/q443), item-CF co-occurrence (q470), and
  * adaptive linkage blocking (q433). Each test plants the exact
  * pathology a skewed 100 TB corpus exhibits — one hot basket / hot
  * block holding thousands of members — runs the DECLARED query over
  * the planted tables, and pins the output against an INDEPENDENT JVM
  * replay (Scala collections, not the query's SQL — the dual-dialect
  * oracle shares one SQL builder, so only a third implementation
  * catches a formula bug):
  *
  *  - q443/q403: Apriori anti-monotone pre-prune must be INVISIBLE in
  *    the output — the replay runs the ORIGINAL unpruned algorithm, so
  *    equality proves bit-identity even when 99% of the hot basket's
  *    items are prunable.
  *  - q470: the per-basket cap must be VISIBLE — the replay runs both
  *    the capped and the uncapped semantics; the query must equal the
  *    capped one and differ from the uncapped one (proof the cap is
  *    active, not vacuous).
  *  - q433: the block-mass escalation must be VISIBLE — the replay
  *    implements the 3-level adaptive key (and its own Levenshtein
  *    DP); the query must match it and differ from a static-pfx2
  *    replay whose hot block would pay ~n²/2 comparisons.
  */
class PlantedQuadraticsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.allDefs.find(_.name == name).get

  /** Write planted tables as `<name>.parquet` under a fresh dir the
    * QueryDef fns can read through `Tables`.
    */
  private def plant(tag: String)(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_planted_$tag").toString
    tables.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  // ------------------------------------------------------- q443 / q403

  /** One 1000-item hot basket (every item support-1 ⇒ prunable) next to
    * a small frequent core. Unpruned pair enumeration pays C(1000,2) =
    * 499,500 rows from the hot basket alone; the Apriori pre-prune pays
    * C(2,2) — and must produce the identical answer.
    */
  private lazy val basketLineitem = {
    val hot = (0 until 1000).map(i => (100L, 10000L + i))
    // parts 1,2 together in orders 1..4 (pair support 4 ≥ 3);
    // part 3 rides along in orders 1..2 only (item support 2 < 3: pruned)
    val core = (1L to 4L).flatMap(o => Seq((o, 1L), (o, 2L))) ++
      Seq((1L, 3L), (2L, 3L))
    (hot ++ core).toDF("l_orderkey", "l_partkey")
  }

  test("q443: planted hot basket — pruned query equals unpruned JVM replay") {
    val dir = plant("ar")("lineitem" -> basketLineitem)
    val op = basketLineitem.collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val n = op.map(_._1).distinct.length.toLong
    val item = op.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    // UNPRUNED enumeration (the r9 semantics): all in-basket pairs
    val pairSupp = op.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      .filter(_._2 >= 3L)
    val want = pairSupp.toSeq.flatMap { case ((x, y), sxy) =>
      Seq((x, y, sxy), (y, x, sxy))
    }.map { case (x, y, sxy) =>
      (x, y, sxy, sxy * 1000000L / item(x), sxy * n * 1000000L / (item(x) * item(y)))
    }.sortBy { case (x, y, _, _, l) => (-l, x, y) }.take(20)
    val got = q("q443_association_rules").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === want)
    assert(want.map(t => (t._1, t._2)).toSet === Set((1L, 2L), (2L, 1L)),
      "only the frequent core survives; the hot basket contributes nothing")
    // the collapse the prune buys: frequent items cut enumeration input
    // from 1008 (o,p) rows to 8
    assert(op.count { case (_, p) => item(p) >= 3L } === 8)
  }

  test("q403: planted hot basket — pruned candidates equal unpruned JVM replay") {
    val minsup = 2L
    val hot = (0 until 500).map(i => (100L, 20000L + i))
    // triple (1,2,3) in orders 1..3; pair (1,4) in orders 4..5
    val core = (1L to 3L).flatMap(o => Seq((o, 1L), (o, 2L), (o, 3L))) ++
      Seq((4L, 1L), (4L, 4L), (5L, 1L), (5L, 4L))
    val li = (hot ++ core).toDF("l_orderkey", "l_partkey")
    val dir = plant("tri")("lineitem" -> li)
    val op = li.collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    // UNPRUNED level-wise replay
    val pairSupp = op.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val pairs = pairSupp.filter(_._2 >= minsup).keySet
    val baskets = op.groupBy(_._1).map { case (o, xs) => o -> xs.map(_._2).toSet }
    val cands = for {
      (a, b) <- pairs; (a2, c) <- pairs
      if a2 == a && b < c && pairs((b, c))
    } yield (a, b, c)
    val want = cands.toSeq.map { case (a, b, c) =>
      (a, b, c, baskets.values.count(s => s(a) && s(b) && s(c)).toLong)
    }.sortBy { case (a, b, c, s) => (-s, a, b, c) }.take(20)
    val got = q("q403_frequent_triples").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
    assert(want === Seq((1L, 2L, 3L, 3L)), "exactly the planted triple")
  }

  // ---------------------------------------------------------------- q470

  /** Capped item-CF replay: per-basket lowest-64 item cap applied to the
    * similarity statistics, full baskets kept for ownership.
    */
  private def cfReplay(
      li: Seq[(Long, Long)], ords: Seq[(Long, Long)],
      cap: Int): Seq[(Long, Long, Long, Long)] = {
    val u = ords.toMap
    val op = li.map { case (ok, p) => (ok, p, u(ok)) }.distinct
    val opc = op.groupBy(_._1).values.flatMap { rows =>
      rows.map(r => (r._1, r._2)).sortBy(_._2).take(cap)
    }.toSeq
    val np = opc.groupBy(_._2).map { case (p, xs) => p -> xs.map(_._1).distinct.length.toLong }
    val cooc = opc.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2)
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val sim = cooc.map { case ((pa, pb), c) =>
      (pa, pb) -> c * c * 1000000L / (np(pa) * np(pb))
    }
    val owned = op.collect { case (_, p, uu) if uu <= 20 => (uu, p) }.distinct
    val ownedBy = owned.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    val cand = owned.flatMap { case (uu, pw) =>
      sim.collect { case ((pa, pb), s) if pa == pw && !ownedBy(uu)(pb) => (uu, pb, s) }
    }.groupBy(t => (t._1, t._2)).map { case ((uu, rec), xs) => (uu, rec, xs.map(_._3).max) }
    cand.groupBy(_._1).toSeq.flatMap { case (uu, xs) =>
      xs.toSeq.sortBy(t => (-t._3, t._2)).zipWithIndex.take(3)
        .map { case ((_, rec, s), i) => (uu, rec, s, i + 1L) }
    }.sortBy(t => (t._1, t._4))
  }

  test("q470: planted hot basket — query equals CAPPED replay, differs from uncapped") {
    // user 1's order 1 holds parts 1..200 (cap 64 binds); part 100 sits
    // beyond the cap and also appears in small orders 2 and 3
    val li = (1L to 200L).map(p => (1L, p)) ++
      Seq((2L, 100L), (2L, 301L), (3L, 100L), (3L, 302L))
    val ords = Seq((1L, 1L), (2L, 2L), (3L, 3L))
    val dir = plant("cf")(
      "lineitem" -> li.toDF("l_orderkey", "l_partkey"),
      "orders" -> ords.toDF("o_orderkey", "o_custkey"))
    val got = q("q470_item_cf_recs").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val capped = cfReplay(li, ords, cap = 64)
    val uncapped = cfReplay(li, ords, cap = Int.MaxValue)
    assert(got === capped)
    assert(capped !== uncapped,
      "the planted basket must make the cap bind — otherwise this test proves nothing")
    // the cap's effect, concretely: user 2's recs come only from the
    // SMALL orders' co-occurrences (part 100 escaped the capped hot
    // basket), not from 199 hot-basket neighbors
    assert(got.filter(_._1 == 2L).map(_._2) === Seq(302L))
    assert(uncapped.filter(_._1 == 2L).map(_._2).length === 3)
  }

  // ---------------------------------------------------------------- q433

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def mlog(x: Double): Long = math.round(math.log(x) * 1e6)

  /** FS replay over a given blocking-key function. */
  private def fsReplay(
      parts: Seq[(Long, String, String, String, Int, Double)],
      blk: ((Long, String, String, String, Int, Double)) => String): Seq[(String, Long, Long, Long)] = {
    val (nameA, nameD) = (mlog(0.95 / 0.05), mlog(0.05 / 0.95))
    val (typeA, typeD) = (mlog(0.90 / 0.05), mlog(0.10 / 0.95))
    val (sizeA, sizeD) = (mlog(0.85 / 0.30), mlog(0.15 / 0.70))
    val (priceA, priceD) = (mlog(0.80 / 0.02), mlog(0.20 / 0.98))
    val scored = for {
      a <- parts; b <- parts
      if blk(a) == blk(b) && a._3 == b._3 &&
        math.abs(a._5 - b._5) <= 1 && a._1 < b._1
    } yield {
      val na = lev(a._2, b._2) <= 4
      val score = (if (na) nameA else nameD) +
        (if (a._4 == b._4) typeA else typeD) +
        (if (a._5 == b._5) sizeA else sizeD) +
        (if (math.abs(math.round(a._6 * 100) - math.round(b._6 * 100)) <= 2000)
           priceA else priceD)
      (score, if (na) 1L else 0L)
    }
    scored.groupBy { case (s, _) =>
      if (s >= 5000000L) "link" else if (s >= 0L) "possible" else "non_link"
    }.map { case (band, xs) =>
      (band, xs.length.toLong, xs.map(_._1).sum, xs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
  }

  /** The query's 3-level adaptive key, replayed independently. */
  private def adaptiveKey(parts: Seq[(Long, String, String, String, Int, Double)])(
      p: (Long, String, String, String, Int, Double)): String = {
    val c0 = parts.groupBy(x => (x._2.take(2), x._3)).map { case (k, xs) => k -> xs.length }
    val c1 = parts.groupBy(x => (x._2.take(6), x._3)).map { case (k, xs) => k -> xs.length }
    if (c0((p._2.take(2), p._3)) <= 64) "0:" + p._2.take(2)
    else if (c1((p._2.take(6), p._3)) <= 64) "1:" + p._2.take(6)
    else "2:" + p._2
  }

  test("q433: planted hot block — query equals adaptive replay, differs from static") {
    // group A: 100 parts sharing pfx2 'ab', all-distinct 6-char prefixes
    //   → L0 hot, L1 singleton blocks: zero pairs (static pays C(100,2))
    val ga = (0 until 100).map { i =>
      (i.toLong, f"ab${('a' + i / 26).toChar}${('a' + i % 26).toChar}q$i%02d widget",
        "Brand#1", "TYPE" + (i % 3), 10, 100.0 + i)
    }
    // group B: 10 parts sharing pfx2 'zz' → stays L0; bands vary
    val gb = (0 until 10).map { i =>
      (200L + i, if (i < 5) "zzaaaa one" else s"zzdiverge $i far",
        "Brand#1", "TYPE" + (i % 2), 20 + (i % 2), if (i < 5) 50.0 else 5000.0 + 100 * i)
    }
    // group C: 70 parts with the IDENTICAL name → escalates L0→L1→L2;
    // the same-name mass is irreducible (they ARE linkage candidates)
    val gc = (0 until 70).map { i =>
      (300L + i, "cccccc same same", "Brand#1", "TYPEC", 30, 77.0)
    }
    val parts = ga ++ gb ++ gc
    val dir = plant("fs")("part" ->
      parts.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    val got = q("q433_fellegi_sunter_linkage").fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val adaptive = fsReplay(parts, adaptiveKey(parts))
    val static0 = fsReplay(parts, _._2.take(2))
    assert(got === adaptive)
    assert(adaptive !== static0, "the planted hot block must trigger escalation")
    // group A contributes zero pairs under escalation; C(70,2) identical-
    // name pairs remain (the irreducible mass); static would add C(100,2)
    // cross-comparisons of unrelated 'ab' names
    val nAdaptive = adaptive.map(_._2).sum
    val nStatic = static0.map(_._2).sum
    assert(nStatic - nAdaptive >= 4000L,
      s"escalation must collapse the hot block: adaptive=$nAdaptive static=$nStatic")
  }
}
