package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninety-fifth wave:
  *
  *  - q447: full JVM replay of the sign-sketch estimate (md5 signs,
  *    means, lower median) and the exact Σf²; the in-bound contract
  *    holds;
  *  - q448: full JVM replay of all 64 relabeled replicates and the
  *    p-value rank; p ∈ (0, 1];
  *  - q449: JVM replay of the strata, weights and ATT; every matched
  *    stratum really contains both groups.
  */
class Training95Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h60(x: String): Long =
    java.lang.Long.parseLong(md5hex(x).take(15), 16)

  test("q447: JVM sketch replay; contract holds") {
    val keys = Tables(spark, dir, "orders")
      .selectExpr("o_custkey").collect().map(_.getLong(0))
    val sums = (0 until 80).map { j =>
      keys.map { k =>
        if ((h60(s"ams:${j / 60}:$k") >> (j % 60)) % 2 == 0) 1L else -1L
      }.sum
    }
    val means = sums.map(x => x * x).grouped(16).map(_.sum / 16).toSeq
    val est = means.zipWithIndex.sortBy { case (m, g) => (m, g) }.map(_._1)(2)
    val exact = keys.groupBy(identity).values.map(g => g.length.toLong * g.length).sum
    val relErr = math.abs(est - exact) * 1000000L / exact
    val r = q("q447_ams_f2_sketch").collect().head
    assert(r.getLong(0) === exact)
    assert(r.getLong(1) === est)
    assert(r.getLong(2) === relErr)
    assert(r.getInt(3) === 1, s"AMS relative error $relErr ppm out of contract")
  }

  test("q448: JVM replicate replay; p-value in (0, 1]") {
    val pop = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"),
        expr("c.c_custkey = o.o_custkey"))
      .filter(expr("c.c_mktsegment IN ('BUILDING', 'MACHINERY')"))
      .selectExpr("CAST(round(o.o_totalprice * 100, 0) AS BIGINT)",
        "o.o_orderkey", "CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val (sa, na) = (pop.filter(_._3 == 1).map(_._1).sum, pop.count(_._3 == 1).toLong)
    val (sb, nb) = (pop.filter(_._3 == 0).map(_._1).sum, pop.count(_._3 == 0).toLong)
    val statObs = math.abs(sa * 1000000L / na - sb * 1000000L / nb)
    val share = na * 1048576L / (na + nb)
    val stats = (0 until 64).flatMap { k =>
      var (psa, pna, psb, pnb) = (0L, 0L, 0L, 0L)
      pop.foreach { case (c, id, _) =>
        if ((h60(s"perm:${k / 3}:$id") >> (20 * (k % 3))) % 1048576 < share) {
          psa += c; pna += 1
        } else { psb += c; pnb += 1 }
      }
      if (pna > 0 && pnb > 0)
        Some(math.abs(psa * 1000000L / pna - psb * 1000000L / pnb))
      else None
    }
    val extreme = stats.count(_ >= statObs).toLong
    val p = (1 + extreme) * 1000000L / (stats.length + 1)
    val r = q("q448_permutation_test").collect().head
    assert(r.getLong(0) === statObs)
    assert(r.getLong(1) === na)
    assert(r.getLong(2) === nb)
    assert(r.getLong(3) === stats.length.toLong)
    assert(r.getLong(4) === extreme)
    assert(r.getLong(5) === p)
    assert(p > 0L && p <= 1000000L)
  }

  test("q449: JVM CEM replay; matched strata contain both groups") {
    val pop = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"),
        expr("c.c_custkey = o.o_custkey"))
      .filter(expr("c.c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')"))
      .selectExpr("CAST(c.c_nationkey AS BIGINT)", "year(o.o_orderdate)",
        "o.o_orderpriority",
        "CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END",
        "CAST(round(o.o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => ((r.getLong(0), r.getInt(1), r.getString(2)),
        r.getInt(3), r.getLong(4)))
    val strata = pop.groupBy(_._1).map { case (k, xs) =>
      (k, xs.count(_._2 == 1).toLong, xs.count(_._2 == 0).toLong,
        xs.filter(_._2 == 1).map(_._3).sum, xs.filter(_._2 == 0).map(_._3).sum)
    }.toSeq
    val matched = strata.filter(s => s._2 > 0 && s._3 > 0)
    val mT = matched.map(_._2).sum; val mC = matched.map(_._3).sum
    val sT = matched.map(_._4).sum
    val wC = matched.map(s => s._5 * s._2 * 1000000L / (s._3 * mT)).sum
    val att = sT * 1000000L / mT - wC
    val tDropped = strata.filter(_._3 == 0).map(_._2).sum
    val r = q("q449_coarsened_exact_matching").collect().head
    assert(r.getLong(0) === matched.length.toLong)
    assert(r.getLong(1) === mT)
    assert(r.getLong(2) === mC)
    assert(r.getLong(3) === tDropped)
    assert(r.getLong(4) === att)
    matched.foreach(s => assert(s._2 > 0 && s._3 > 0))
  }
}
