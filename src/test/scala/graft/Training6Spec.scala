package graft

import org.apache.spark.sql.functions._

/** Invariants for the sixth wave (q133-q137) beyond the row/hash oracle:
  * the CMS and t-digest flags must be TRUE because the bound genuinely
  * holds (not because the predicate is vacuous), PII redaction must be
  * idempotent and total, entropy must rank constant-ish text below
  * diverse text, and the negative sample must be label-correct and
  * stable under repartitioning.
  */
class Training6Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q133: every top-20 heavy hitter satisfies the CMS bound, non-vacuously") {
    val rows = q("q133_cms_heavy_hitters").collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Boolean]("cms_ok")))
    // non-vacuous: the exact counts must be real heavy hitters (the
    // synthetic vocabulary is small, so each top word appears a lot)
    assert(rows.forall(_.getAs[Long]("n_exact") > 10))
  }

  test("q134: sketch-median rank flag holds per group and the witness is the true median") {
    val rows = q("q134_tdigest_rank_gate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("tdigest_ok"))
      val flag = r.getAs[String]("l_returnflag")
      val vals = Tables(spark, dir, "lineitem")
        .filter(col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
      val n = vals.length
      val med =
        if (n % 2 == 1) vals(n / 2)
        else (vals(n / 2 - 1) + vals(n / 2)) / 2.0
      assert(math.abs(r.getAs[Double]("median_exact") - med) < 1e-5)
    }
  }

  test("q135: redaction removes every planted match and is idempotent") {
    // rebuild the augmented text + redaction exactly as the query does,
    // on a sample, and check (a) no pattern survives, (b) a second
    // redaction pass is a no-op
    val pats = Seq(
      "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}",
      "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
      "555-[0-9]{4}")
    val aug = Tables(spark, dir, "documents")
      .selectExpr("""concat(text,
        CASE WHEN doc_id % 7 = 0 THEN concat(' contact user', cast(doc_id AS string), '@example.com now') ELSE '' END,
        CASE WHEN doc_id % 11 = 0 THEN concat(' from 10.0.', cast(doc_id % 256 AS string), '.', cast(doc_id % 100 AS string), ' host') ELSE '' END,
        CASE WHEN doc_id % 13 = 0 THEN concat(' call 555-01', lpad(cast(doc_id % 100 AS string), 2, '0'), ' ok') ELSE '' END) AS aug""")
    val red = pats.foldLeft(aug.select(col("aug").as("t"))) { (df, p) =>
      df.select(regexp_replace(col("t"), p, "<X>").as("t"))
    }
    val survivors = pats.map(p =>
      red.filter(col("t").rlike(p)).count()).sum
    assert(survivors == 0)
    val twice = pats.foldLeft(red) { (df, p) =>
      df.select(regexp_replace(col("t"), p, "<X>").as("t"))
    }
    assert(red.exceptAll(twice).count() == 0)
    // and the query itself found at least one of each kind
    val m = q("q135_pii_redaction").collect()
    assert(m.map(_.getAs[Long]("n_emails")).sum > 0)
    assert(m.map(_.getAs[Long]("n_ips")).sum > 0)
    assert(m.map(_.getAs[Long]("n_phones")).sum > 0)
    assert(m.map(_.getAs[Long]("chars_removed")).sum > 0)
  }

  test("q136: entropy formula matches a JVM reference and ranks degenerate text low") {
    // JVM reference on the same 256-char prefix, same micro-nat recipe
    def hRef(text: String): Long = {
      val prefix = text.take(256)
      val counts = prefix.groupBy(identity).values.map(_.length.toLong)
      val n = counts.sum
      // SQL round() is half-AWAY-FROM-ZERO; ln(x) >= 0 here, so
      // floor(x + 0.5) reproduces it exactly (math.rint would round
      // half-to-even and diverge on exact .5 boundaries)
      def lnMicro(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
      val num = n * lnMicro(n) - counts.map(c => c * lnMicro(c)).sum
      (2 * num + n) / (2 * n)
    }
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = q("q136_char_entropy").collect()
    assert(got.length == 25)
    got.foreach { r =>
      assert(r.getAs[Long]("h_micro") == hRef(docs(r.getAs[Long]("doc_id"))))
    }
    // the 25 lowest are genuinely the lowest: compare against the full
    // reference ranking
    val all = docs.toSeq.map { case (id, t) => (hRef(t), id) }.sorted.take(25)
    assert(got.map(r => (r.getAs[Long]("h_micro"), r.getAs[Long]("doc_id"))).sorted.toSeq == all)
    // and a degenerate string scores below any real document
    assert(hRef("aaaaaaaaaaaaaaaa") == 0)
  }

  test("q137: negatives have a different label than their anchor, 5 per anchor, stable") {
    val labels = Tables(spark, dir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = q("q137_negative_sampling").collect()
    val byAnchor = rows.groupBy(_.getAs[Long]("a_id"))
    assert(byAnchor.forall(_._2.length == 5))
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("a_id")) != labels(r.getAs[Long]("neg_id")))
    }
    // determinism: a second run (fresh plan, fresh shuffles) returns the
    // identical set — the sample is a pure function of the ids
    val again = q("q137_negative_sampling").collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("q143: triangle count matches a JVM adjacency-set reference") {
    val op = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    // oriented adjacency: neighbors greater than the node
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val triRef = edges.toSeq.map { case (u, v) =>
      adj.getOrElse(u, Set.empty).count(w => w > v && adj.getOrElse(v, Set.empty).contains(w))
    }.sum
    val row = q("q143_triangle_count").collect().head
    assert(row.getAs[Long]("n_edges") == edges.size)
    assert(row.getAs[Long]("n_triangles") == triRef)
  }

  test("q144: interpolation matches a JVM reference per user") {
    val ev = Tables(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS day", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lo = ev.map(_._2).min
    val hi = ev.map(_._2).max
    def micro(vals: Seq[Double]): Long =
      vals.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.*(BigDecimal(1000000)).toLongExact
    val ref = ev.groupBy(_._1).map { case (u, rows) =>
      val known = rows.groupBy(_._2).map { case (day, rs) => day -> micro(rs.map(_._3).toSeq) }
      val days = (lo to hi).toSeq
      var nInterp = 0L
      var sumInterp = 0L
      days.foreach { day =>
        if (!known.contains(day)) {
          val prev = known.keys.filter(_ < day)
          val next = known.keys.filter(_ > day)
          if (prev.nonEmpty && next.nonEmpty) {
            val pd = prev.max; val nd = next.min
            val num = known(pd) * (nd - day) + known(nd) * (day - pd)
            val den = nd - pd
            val v = if (num >= 0) (2 * num + den) / (2 * den)
                    else -((2 * -num + den) / (2 * den))
            nInterp += 1; sumInterp += v
          }
        }
      }
      u -> (days.length.toLong, known.size.toLong, nInterp, sumInterp)
    }
    val got = q("q144_interpolate").collect()
    assert(got.length == ref.size)
    got.foreach { r =>
      val (nDays, nKnown, nInterp, sumInterp) = ref(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_days") == nDays)
      assert(r.getAs[Long]("n_known") == nKnown)
      assert(r.getAs[Long]("n_interp") == nInterp)
      assert(r.getAs[Long]("sum_interp_micro") == sumInterp)
    }
  }
}
