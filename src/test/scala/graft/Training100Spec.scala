package graft

import org.apache.spark.sql.functions._

/** Invariants for the hundredth wave:
  *
  *  - q462: sequential two-pointer FIFO replay per part (the imperative
  *    algorithm the cumulative-interval join replaces) — per-brand
  *    matched/unfilled/leftover and PAIR COUNTS all match; per part,
  *    matched = min(supply, demand) (the fill law).
  *  - q463: JVM IPF replay under identical integer floor-div scaling;
  *    final weights match cell-for-cell; the column marginal gap after
  *    the final column scaling never exceeds the pre-scaling gap, and
  *    zero cells stay zero (IPF support preservation).
  *  - q464: JVM brute force over all 120 permutations + greedy replay;
  *    the optimal assignment matches, greedy matches, and
  *    total_opt ≤ total_greedy.
  */
class Training100Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q462: two-pointer FIFO replay; fill law per part") {
    val li = Tables(spark, dir, "lineitem")
      .selectExpr("l_partkey", "CAST(round(l_quantity, 0) AS BIGINT) AS q",
        "l_shipdate", "l_orderkey", "l_linenumber")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString, r.getLong(3), r.getInt(4)))
    val brandOf = Tables(spark, dir, "part")
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def lots(parity: Int) = li.filter(_._5 % 2 == parity)
      .groupBy(_._1).map { case (p, xs) =>
        p -> xs.sortBy(x => (x._3, x._4, x._5)).map(_._2).toArray
      }
    val sup = lots(1); val dem = lots(0)
    case class Acc(var m: Long = 0, var uf: Long = 0, var lo: Long = 0, var np: Long = 0)
    val acc = collection.mutable.Map[String, Acc]()
    for (p <- (sup.keySet ++ dem.keySet)) {
      val s = sup.getOrElse(p, Array.empty[Long]).clone()
      val d = dem.getOrElse(p, Array.empty[Long]).clone()
      var (i, j) = (0, 0); var m = 0L; var np = 0L
      while (i < s.length && j < d.length) {
        val take = math.min(s(i), d(j))
        m += take; np += 1
        s(i) -= take; d(j) -= take
        if (s(i) == 0) i += 1
        if (d(j) == 0) j += 1
      }
      val ts = sup.getOrElse(p, Array.empty[Long]).sum
      val td = dem.getOrElse(p, Array.empty[Long]).sum
      assert(m === math.min(ts, td), s"fill law part $p")
      val a = acc.getOrElseUpdate(brandOf(p), Acc())
      a.m += m; a.uf += td - m; a.lo += ts - m; a.np += np
    }
    val got = q("q462_fifo_inventory").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === acc.size)
    got.foreach { case (b, m, uf, lo, np) =>
      val a = acc(b)
      assert((m, uf, lo, np) === ((a.m, a.uf, a.lo, a.np)), s"brand $b")
    }
  }

  test("q463: integer IPF replay; gap contraction; support preservation") {
    val cells = Tables(spark, dir, "customer")
      .groupBy(col("c_mktsegment").as("seg"),
        expr("CAST(c_nationkey AS BIGINT)").as("nk"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    var w = cells.toMap
    def colGap(m: Map[(String, Long), Long]): Long = {
      val cs = m.groupBy(_._1._2).map { case (_, xs) => xs.values.sum }
      cs.map(c => math.abs(c - 40000L)).sum
    }
    var gapBeforeLastCol = 0L
    for (r <- 1 to 10) {
      if (r == 10) gapBeforeLastCol = colGap(w)
      val (byKey, target) =
        if (r % 2 == 1) ((k: (String, Long)) => k._1: Any, 200000L)
        else ((k: (String, Long)) => k._2: Any, 40000L)
      val sums = w.groupBy { case (k, _) => byKey(k) }
        .map { case (g, xs) => g -> xs.values.sum }
      w = w.map { case (k, v) =>
        val gs = sums(byKey(k))
        k -> (if (gs == 0) 0L else Math.floorDiv(v * target, gs))
      }
    }
    val rowGap = w.groupBy(_._1._1).map { case (_, xs) => xs.values.sum }
      .map(rs => math.abs(rs - 200000L)).sum
    val cGap = colGap(w)
    val got = q("q463_ipf_raking").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === cells.length)
    got.foreach { case (seg, nk, gw, rg, cg) =>
      assert(gw === w((seg, nk)), s"cell ($seg, $nk)")
      assert(rg === rowGap); assert(cg === cGap)
      if (cells.toMap.apply((seg, nk)) == 0L) assert(gw === 0L, "support preservation")
    }
    assert(cGap <= gapBeforeLastCol, "final column scaling contracts the column gap")
  }

  test("q464: brute-force permutation replay; optimal <= greedy") {
    val cost = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"), expr("c.c_custkey = o.o_custkey"))
      .join(Tables(spark, dir, "lineitem").as("l"), expr("l.l_orderkey = o.o_orderkey"))
      .groupBy(col("c.c_mktsegment").as("seg"), col("o.o_orderpriority").as("prio"))
      .agg(expr("CAST(sum(CAST(datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS BIGINT)) * 1000000 div count(*) AS BIGINT)").as("c"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val segs = cost.keys.map(_._1).toSeq.distinct.sorted
    val prios = cost.keys.map(_._2).toSeq.distinct.sorted
    assert(segs.length === 5 && prios.length === 5)
    val best = prios.permutations.map { pm =>
      (segs.zip(pm).map(cost).sum, pm)
    }.minBy { case (tot, pm) => (tot, pm.mkString("|")) }
    val used = collection.mutable.Set[String]()
    val greedy = segs.map { s =>
      val p = prios.filterNot(used).minBy(p => (cost((s, p)), p))
      used += p; (s, p, cost((s, p)))
    }
    val totalGreedy = greedy.map(_._3).sum
    val got = q("q464_assignment_optimal").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.map(_._1).toSeq === segs)
    got.zip(segs.zip(best._2)).zip(greedy).foreach {
      case ((g, (s, optP)), (_, gp, gc)) =>
        assert(g._2 === optP, s"optimal pick for $s")
        assert(g._3 === cost((s, optP)))
        assert(g._4 === gp, s"greedy pick for $s")
        assert(g._5 === gc)
        assert(g._6 === best._1)
        assert(g._7 === totalGreedy)
        assert(g._6 <= g._7, "optimal <= greedy")
    }
  }
}
