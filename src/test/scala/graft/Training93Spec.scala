package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninety-third wave:
  *
  *  - q441: JVM replay of the binned-CDF transport distance; W1 ≥ 0
  *    and the scaled CDF-difference mass matches exactly;
  *  - q442: the sparse-table lookup equals the direct range min on
  *    EVERY query (the two-overlapping-blocks theorem, also pinned
  *    in-query), with k really ⌊log2(b−a)⌋;
  *  - q443: JVM replay of the top-20 rules; confidence ≤ 1, support
  *    floor respected, and lift is symmetric across directions.
  */
class Training93Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q441: JVM replay; W1 non-negative") {
    val rows = Tables(spark, dir, "orders")
      .selectExpr("CAST(round(o_totalprice * 100, 0) AS BIGINT)",
        "CASE WHEN o_orderdate < DATE'1998-01-01' THEN 0 ELSE 1 END")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val (mn, mx) = (rows.map(_._1).min, rows.map(_._1).max)
    val ca = new Array[Long](64); val cb = new Array[Long](64)
    rows.foreach { case (c, p) =>
      val bin = ((c - mn) * 64 / (mx - mn + 1)).toInt
      if (p == 0) ca(bin) += 1 else cb(bin) += 1
    }
    val (na, nb) = (ca.sum, cb.sum)
    var cuma = 0L; var cumb = 0L; var sumAbs = 0L; var w1 = 0L
    val width = (mx - mn + 1) / 64
    // only bins that actually occur carry CDF rows in the query
    (0 until 64).filter(b => ca(b) + cb(b) > 0).foreach { b =>
      cuma += ca(b); cumb += cb(b)
      val diff = math.abs(cuma * nb - cumb * na)
      sumAbs += diff
      w1 += diff * 1000000L / (na * nb)
    }
    w1 *= width
    val r = q("q441_wasserstein_drift").collect().head
    assert(r.getLong(0) === na)
    assert(r.getLong(1) === nb)
    assert(r.getLong(2) === width)
    assert(r.getLong(3) === sumAbs)
    assert(r.getLong(4) === w1)
    assert(w1 >= 0L)
  }

  test("q442: table lookup equals direct min everywhere; k is floor log2") {
    val got = q("q442_sparse_table_rmq").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(got.length === 12)
    got.foreach { case (qid, a, b, k, tbl, direct, m) =>
      assert(m === 1, s"query $qid: table $tbl != direct $direct")
      assert(tbl === direct)
      assert(k === 31 - Integer.numberOfLeadingZeros(b - a),
        s"query $qid: wrong level $k for span ${b - a}")
      assert((1 << k) <= (b - a) && (b - a) < (1 << (k + 1)))
    }
  }

  test("q443: JVM rule replay; confidence bounded, lift symmetric") {
    val op = Tables(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = op.map(_._1).distinct.length.toLong
    val item = op.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairSupp = op.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      .filter(_._2 >= 3L)
    val rules = pairSupp.toSeq.flatMap { case ((x, y), sxy) =>
      Seq((x, y, sxy), (y, x, sxy))
    }.map { case (x, y, sxy) =>
      (x, y, sxy, sxy * 1000000L / item(x), sxy * n * 1000000L / (item(x) * item(y)))
    }
    val want = rules.sortBy { case (x, y, _, _, l) => (-l, x, y) }.take(20)
    val got = q("q443_association_rules").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === want)
    got.foreach { case (_, _, sxy, conf, _) =>
      assert(sxy >= 3L)
      assert(conf <= 1000000L, "confidence is a probability")
    }
    // lift is direction-symmetric up to integer floor: recompute exact
    val liftOf = rules.map(r => (r._1, r._2) -> r._5).toMap
    got.foreach { case (x, y, _, _, l) =>
      liftOf.get((y, x)).foreach { back =>
        assert(math.abs(back - l) <= 1L,
          s"lift must be symmetric up to flooring: $l vs $back")
      }
    }
  }
}
