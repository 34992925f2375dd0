package graft

import org.apache.spark.sql.functions._

/** Invariants for the hundred-fifth wave:
  *
  *  - q475: JVM Luhn replay (string-digit implementation, independent of
  *    the SQL's arithmetic digit extraction); the detection law — Luhn
  *    catches every single-digit substitution, so n_invalid equals
  *    n_corrupted exactly and uncorrupted accounts all validate.
  *  - q476: brute-force O(n²) overlapping-pair recount per key equals
  *    the sweep's count; peak concurrency cross-checked by point
  *    stabbing at every start.
  *  - q477: JVM correlated-form replay (per-part loop, the third
  *    algebraic form) matches the declared group-rewrite.
  */
class Training105Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  private def luhnValid(acct: Long): Boolean = {
    val ds = acct.toString.reverse.map(_ - '0')
    val sum = ds.zipWithIndex.map { case (d, i) =>
      if (i % 2 == 1) { val x = 2 * d; if (x > 9) x - 9 else x } else d
    }.sum
    sum % 10 == 0
  }

  test("q475: string-digit Luhn replay; every substitution caught") {
    val custs = Tables(spark, dir, "customer")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def checkDigit(base: Long): Long = {
      val ds = (base * 10).toString.reverse.map(_ - '0')
      val sum = ds.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = 2 * d; if (x > 9) x - 9 else x } else d
      }.sum
      (10 - sum % 10) % 10
    }
    val rows = custs.map { case (k, seg) =>
      val acct = k * 10 + checkDigit(k)
      val corrupted = k % 7 == 0
      val finalAcct =
        if (corrupted) {
          val d = (acct / 100) % 10
          acct + (((d + 1) % 10) - d) * 100
        } else acct
      (seg, finalAcct, corrupted)
    }
    rows.foreach { case (_, acct, corrupted) =>
      assert(luhnValid(acct) === !corrupted,
        s"Luhn must reject exactly the corrupted accounts ($acct)")
    }
    val want = rows.groupBy(_._1).map { case (seg, xs) =>
      seg -> ((xs.length.toLong, xs.count(!_._3).toLong,
        xs.count(_._3).toLong, xs.count(_._3).toLong))
    }
    val got = q("q475_luhn_validation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === want.size)
    got.foreach { case (seg, n, nv, ni, nc) =>
      assert((n, nv, ni, nc) === want(seg), s"segment $seg")
    }
  }

  test("q476: brute-force pair recount; stabbing concurrency check") {
    val txns = Tables(spark, dir, "events")
      .groupBy(expr("event_id div 8").as("tid"))
      .agg(min("event_type").as("k"),
        expr("unix_micros(min(ts))").as("s"), expr("unix_micros(max(ts))").as("e"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = txns.groupBy(_._2).map { case (k, xs) =>
      var pairs = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length) {
        val a = xs(i); val b = xs(j)
        if (a._3 <= b._4 && b._3 <= a._4) pairs += 1
      }
      val peak = xs.map { a =>
        xs.count(b => b._3 <= a._3 && a._3 <= b._4).toLong
      }.max
      k -> ((xs.length.toLong, pairs, peak))
    }
    val got = q("q476_si_conflict_sweep").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === want.size)
    got.foreach { case (k, n, pairs, peak) =>
      assert((n, pairs, peak) === want(k), s"key $k")
    }
  }

  test("q477: correlated-form JVM replay matches the group rewrite") {
    val li = Tables(spark, dir, "lineitem")
      .selectExpr("l_partkey",
        "CAST(round(l_quantity * 100, 0) AS BIGINT) AS q100",
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brand = Tables(spark, dir, "part")
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val stats = li.groupBy(_._1).map { case (pk, xs) =>
      pk -> ((xs.length.toLong, xs.map(_._2).sum))
    }
    val want = li.filter { case (pk, q, _) =>
      val (cnt, sq) = stats(pk); 5 * q * cnt < sq
    }.groupBy(x => brand(x._1)).map { case (b, xs) =>
      b -> ((xs.length.toLong, xs.map(_._3).sum))
    }
    val got = q("q477_decorrelated_q17").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === want.size)
    got.foreach { case (b, n, rev) => assert((n, rev) === want(b), s"brand $b") }
  }
}
