package graft

import org.apache.spark.sql.functions._

/** Invariants for the hundred-third wave:
  *
  *  - q469: JVM full-batch perceptron replay (same integer features,
  *    same update rule) — the learning curve and every weight match;
  *    once an epoch reports zero errors the weights are a fixpoint (no
  *    later epoch changes anything).
  *  - q470: JVM collaborative-filtering replay (co-occurrence counts,
  *    ppm cosine², max-over-owned scoring, top-3) — and no recommended
  *    part is already owned by its user.
  *  - q471: JVM bracket replay; blended average rate is non-increasing
  *    across usage deciles (rates are progressive-down).
  */
class Training103Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q469: JVM perceptron replay; zero-error fixpoint") {
    val data = Tables(spark, dir, "embeddings")
      .selectExpr("CASE WHEN label % 2 = 0 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y",
        "transform(slice(embedding, 1, 8), x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS xs")
      .collect().map { r =>
        (r.getLong(0), 1000000L +: r.getSeq[Long](1).toArray.toSeq)
      }
    val w = Array.fill(9)(0L)
    val curve = (1 to 6).map { _ =>
      var nerr = 0L
      val delta = Array.fill(9)(0L)
      data.foreach { case (y, xs) =>
        val marg = w.indices.map(k => w(k) * xs(k)).sum
        if (y * marg <= 0) {
          nerr += 1
          w.indices.foreach(k => delta(k) += y * xs(k))
        }
      }
      w.indices.foreach(k => w(k) += delta(k))
      (nerr, w.clone.toSeq)
    }
    val got = q("q469_batch_perceptron").collect()
      .map(r => (r.getLong(0), r.getLong(1), (2 to 10).map(r.getLong).toSeq))
      .sortBy(_._1)
    assert(got.length === 6)
    got.zip(curve).zipWithIndex.foreach { case (((ep, nerr, ws), (wantErr, wantW)), i) =>
      assert(ep === i + 1L)
      assert(nerr === wantErr, s"epoch ${i + 1} errors")
      assert(ws === wantW, s"epoch ${i + 1} weights")
    }
    // fixpoint law: after a zero-error epoch nothing changes
    got.sliding(2).foreach { case Array(a, b) =>
      if (a._2 == 0L) { assert(b._2 === 0L); assert(b._3 === a._3) }
    }
  }

  test("q470: JVM CF replay; recommendations never owned") {
    val op = Tables(spark, dir, "lineitem").as("l")
      .join(Tables(spark, dir, "orders").as("o"), expr("o.o_orderkey = l.l_orderkey"))
      .selectExpr("l.l_orderkey AS ok", "l.l_partkey AS p", "o.o_custkey AS u")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val np = op.map(x => (x._2, x._1)).distinct.groupBy(_._1).map { case (p, xs) => p -> xs.length.toLong }
    val byOrder = op.map(x => (x._1, x._2)).distinct.groupBy(_._1)
    val cooc = collection.mutable.Map[(Long, Long), Long]()
    byOrder.values.foreach { xs =>
      val ps = xs.map(_._2)
      for (a <- ps; b <- ps if a != b) cooc((a, b)) = cooc.getOrElse((a, b), 0L) + 1
    }
    val sim = cooc.map { case ((a, b), c) => (a, b) -> c * c * 1000000L / (np(a) * np(b)) }
    val owned = op.filter(_._3 <= 20).map(x => (x._3, x._2)).distinct
    val ownedBy = owned.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).toSet }
    val want = ownedBy.toSeq.flatMap { case (u, ps) =>
      val scores = collection.mutable.Map[Long, Long]()
      for (p <- ps; ((a, b), s) <- sim if a == p && !ps.contains(b))
        scores(b) = math.max(scores.getOrElse(b, Long.MinValue), s)
      scores.toSeq.sortBy { case (rec, s) => (-s, rec) }.take(3)
        .zipWithIndex.map { case ((rec, s), i) => (u, rec, s, i + 1L) }
    }.sortBy(x => (x._1, x._4))
    val got = q("q470_item_cf_recs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
    got.foreach { case (u, rec, _, _) =>
      assert(!ownedBy(u).contains(rec), s"user $u already owns $rec")
    }
  }

  test("q471: JVM bracket replay; blended rate non-increasing") {
    val usage = Tables(spark, dir, "lineitem").as("l")
      .join(Tables(spark, dir, "orders").as("o"), expr("o.o_orderkey = l.l_orderkey"))
      .groupBy(col("o.o_custkey").as("u_key"))
      .agg(expr("CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)").as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def charge(u: Long): Long =
      50 * math.max(0L, math.min(u, 100L)) +
        40 * math.max(0L, math.min(u, 500L) - 100L) +
        30 * math.max(0L, math.min(u, 2000L) - 500L) +
        20 * math.max(0L, u - 2000L)
    val sorted = usage.sortBy { case (k, u) => (u, k) }
    val n = sorted.length
    // ntile(10): first (n % 10) tiles get ceil(n/10)
    val base = n / 10; val extra = n % 10
    var idx = 0
    val want = (1 to 10).map { dec =>
      val size = base + (if (dec <= extra) 1 else 0)
      val slice = sorted.slice(idx, idx + size); idx += size
      val us = slice.map(_._2).sum
      val cs = slice.map(x => charge(x._2)).sum
      (dec.toLong, size.toLong, us, cs, cs * 1000000L / us)
    }
    val got = q("q471_tiered_billing").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === want)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 <= a._5, "average rate non-increasing in usage")
    }
  }
}
