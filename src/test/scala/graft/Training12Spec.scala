package graft

import org.apache.spark.sql.functions._

/** Invariants for the twelfth wave (q181-q186) beyond the row/hash
  * oracle: every statistic is recomputed independently in plain JVM
  * Scala from the same collected inputs, plus the structural
  * identities (bounds, conservation, flag consistency) a wrong
  * implementation would break.
  */
class Training12Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  private def halfUp(s: Long, n: Long): Long = (2 * s + n) / (2 * n)

  private lazy val docs: Array[(Long, String, String, Long)] =
    Tables(spark, dir, "documents")
      .select("doc_id", "source", "text", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("q181: ESS matches a JVM Kish recount and never exceeds 1e6 ppm") {
    val rows = q("q181_ess_weights").collect()
    val bySource = docs.groupBy(_._2)
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val ws = bySource(r.getAs[String]("source"))
        .map(d => math.min(10L, math.max(1L, d._4 / 100)))
      val (n, sw, sww) = (ws.length.toLong, ws.sum, ws.map(w => w * w).sum)
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("sum_w") == sw)
      assert(r.getAs[Long]("sum_w2") == sww)
      val ess = halfUp(1000000L * sw * sw, n * sww)
      assert(r.getAs[Long]("ess_ppm") == ess, s"${r.getAs[String]("source")}")
      // Kish: ESS ≤ n, with equality iff weights are uniform
      assert(r.getAs[Long]("ess_ppm") <= 1000000L)
      if (ws.distinct.length > 1) assert(r.getAs[Long]("ess_ppm") < 1000000L)
    }
  }

  test("q182: every pair's shared count and Jaccard match a JVM set recount") {
    val vocab = docs.groupBy(_._2)
      .map { case (src, ds) =>
        src -> ds.flatMap(_._3.split(" ")).filter(_.nonEmpty).toSet
      }
    val rows = q("q182_vocab_overlap").collect()
    val srcs = vocab.keys.toSeq.sorted
    assert(rows.length == srcs.length * (srcs.length - 1) / 2)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a < b)
      val inter = (vocab(a) & vocab(b)).size.toLong
      val union = (vocab(a) | vocab(b)).size.toLong
      assert(r.getAs[Long]("shared") == inter, s"$a-$b shared")
      assert(r.getAs[Long]("jaccard_ppm") == halfUp(1000000L * inter, union),
        s"$a-$b jaccard")
    }
  }

  test("q183: pair mass equals q46's candidate pairs and leak flags are consistent") {
    val rows = q("q183_split_leakage").collect()
    val totalPairs = q("q46_minhash_pairs").count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == totalPairs,
      "split contingency must conserve the candidate-pair mass")
    val splits = Set("train", "valid", "test")
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[String]("split_lo"), r.getAs[String]("split_hi"))
      assert(splits.contains(lo) && splits.contains(hi))
      assert(lo <= hi, "pair key must be canonical (lo ≤ hi)")
      assert(r.getAs[Boolean]("leaked") == (lo != hi))
      assert(r.getAs[Long]("n_pairs") > 0)
    }
  }

  /** JVM reimplementation of the q41 marker heuristic. */
  private def guess(text: String): String = {
    val words = text.split(" ")
    def hits(ms: Seq[String]) = words.count(ms.contains).toLong
    val en = hits(Seq("the", "a", "and", "of"))
    val es = hits(Seq("el", "los", "las", "una"))
    val de = hits(Seq("der", "die", "und", "das"))
    val fr = hits(Seq("les", "et", "dans", "une"))
    if (en >= math.max(es, math.max(de, fr)) && en >= 1) "en"
    else if (es >= math.max(de, fr) && es >= 1) "es"
    else if (de >= fr && de >= 1) "de"
    else if (fr >= 1) "fr"
    else "unknown"
  }

  private lazy val labeled: Array[(String, String)] = {
    val byId = Tables(spark, dir, "documents").select("text", "lang")
      .collect().map(r => (r.getString(1), guess(r.getString(0))))
    byId
  }

  test("q184: kappa matches a JVM confusion-matrix recount and is ≤ 1") {
    val r = q("q184_lang_kappa").collect().head
    val n = labeled.length.toLong
    val a = labeled.count { case (l, g) => l == g }.toLong
    val rt = labeled.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val ct = labeled.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val p = rt.map { case (c, r0) => r0 * ct.getOrElse(c, 0L) }.sum
    val kappa = BigDecimal((n * a - p).toDouble / (n * n - p).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("n_agree") == a)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-9,
      s"kappa ${r.getAs[Double]("kappa")} vs $kappa")
    assert(r.getAs[Double]("kappa") <= 1.0)
  }

  test("q185: per-class P/R/F1 match a JVM recount; diagonal mass is conserved") {
    val rows = q("q185_lang_prf").collect()
    val actual = labeled.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val guessed = labeled.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val tp = labeled.filter { case (l, g) => l == g }
      .groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val classes = (actual.keySet ++ guessed.keySet).toSeq.sorted
    assert(rows.map(_.getAs[String]("cls")).toSeq == classes)
    rows.foreach { r =>
      val c = r.getAs[String]("cls")
      val (na, ng, t) =
        (actual.getOrElse(c, 0L), guessed.getOrElse(c, 0L), tp.getOrElse(c, 0L))
      assert(r.getAs[Long]("n_actual") == na)
      assert(r.getAs[Long]("n_guessed") == ng)
      assert(r.getAs[Long]("tp") == t)
      assert(r.getAs[Long]("precision_ppm") ==
        (if (ng == 0) 0L else halfUp(1000000L * t, ng)))
      assert(r.getAs[Long]("recall_ppm") ==
        (if (na == 0) 0L else halfUp(1000000L * t, na)))
      assert(r.getAs[Long]("f1_ppm") ==
        (if (na + ng == 0) 0L else halfUp(2000000L * t, na + ng)))
    }
    // diagonal conservation: per-class TPs sum to q184's agreement count
    assert(rows.map(_.getAs[Long]("tp")).sum ==
      labeled.count { case (l, g) => l == g }.toLong)
  }

  test("q186: VMR matches a JVM recount and detects planted burstiness") {
    val events = Tables(spark, dir, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = q("q186_event_dispersion").collect()
    val byType = events.groupBy(_._1)
    assert(rows.length == byType.size)
    rows.foreach { r =>
      val cs = byType(r.getAs[String]("event_type"))
        .groupBy(_._2).map(_._2.length.toLong).toArray
      val (n, s0, q0) = (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
      assert(r.getAs[Long]("n_users") == n)
      assert(r.getAs[Long]("n_events") == s0)
      val vmr = halfUp(1000000L * (n * q0 - s0 * s0), n * s0)
      assert(r.getAs[Long]("vmr_ppm") == vmr, r.getAs[String]("event_type"))
      assert(r.getAs[Long]("vmr_ppm") >= 0)
    }
  }
}
