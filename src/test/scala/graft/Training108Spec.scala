package graft

import org.apache.spark.sql.functions._

/** Invariants for the hundred-eighth wave:
  *
  *  - q484: imperative DRF replay (while-loop with early exit — the
  *    fixed-round query must agree because saturated rounds are no-ops);
  *    the fairness law: any two tenants' dominant allocations differ by
  *    at most one task's dominant demand, unless the larger one simply
  *    no longer fits.
  *  - q485: JVM knapsack DP replay; optimum monotone in capacity; every
  *    reported optimum is achievable (witness reconstructed by the
  *    replay) and no single item beats it.
  *  - q486: brute-force scan over EVERY candidate stock level proves
  *    s* minimizes the pinball cost among observed demands (discrete
  *    newsvendor optimality), and cost(s*) ≤ cost(mean).
  */
class Training108Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q484: imperative DRF replay; fairness law") {
    val demands = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"), expr("c.c_custkey = o.o_custkey"))
      .groupBy(col("c.c_mktsegment").as("seg"))
      .agg(expr("CAST(2 + (count(*) % 7) AS BIGINT)").as("dcpu"),
        expr("CAST(2 + (CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS BIGINT) div 1000000) % 9 AS BIGINT)").as("dmem"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val cpu = collection.mutable.Map(demands.map(x => x._1 -> 0L): _*)
    val mem = collection.mutable.Map(demands.map(x => x._1 -> 0L): _*)
    val nt = collection.mutable.Map(demands.map(x => x._1 -> 0L): _*)
    for (_ <- 1 to 40) {
      val remC = 4000L - cpu.values.sum
      val remM = 4000L - mem.values.sum
      val fitting = demands.filter { case (s, dc, dm) => dc <= remC && dm <= remM }
      if (fitting.nonEmpty) {
        val (s, dc, dm) = fitting.minBy { case (s, _, _) =>
          (math.max(cpu(s), mem(s)), s)
        }
        cpu(s) += dc; mem(s) += dm; nt(s) += 1
      }
    }
    val got = q("q484_drf_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length === demands.length)
    got.foreach { case (s, dc, dm, n, c, m, ppm) =>
      assert((n, c, m) === ((nt(s), cpu(s), mem(s))), s"tenant $s")
      assert(ppm === math.max(c, m) * 1000000L / 4000L)
    }
    // fairness: dominant shares within one dominant demand of each other,
    // unless the lagging tenant could not fit another task at the end
    val remC = 4000L - cpu.values.sum
    val remM = 4000L - mem.values.sum
    for ((sa, dca, dma) <- demands; (sb, _, _) <- demands if sa != sb) {
      val da = math.max(cpu(sa), mem(sa))
      val db = math.max(cpu(sb), mem(sb))
      val fitsA = dca <= remC && dma <= remM
      if (fitsA)
        assert(da + math.max(dca, dma) >= db,
          s"$sa lags $sb by more than one task while still fitting")
    }
  }

  test("q485: JVM knapsack DP replay; monotone and achievable") {
    val items = Tables(spark, dir, "part")
      .filter("p_partkey BETWEEN 1 AND 24")
      .selectExpr("CAST(p_partkey AS BIGINT)", "CAST(1 + p_size % 10 AS BIGINT)",
        "CAST(round(p_retailprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val dp = Array.fill(61)(0L)
    items.foreach { case (_, w, v) =>
      for (c <- 60 to 0 by -1 if c >= w)
        dp(c) = math.max(dp(c), dp((c - w).toInt) + v)
    }
    val got = q("q485_knapsack_dp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(10L, 20L, 30L, 40L, 50L, 60L))
    got.foreach { case (c, opt) => assert(opt === dp(c.toInt), s"capacity $c") }
    got.sliding(2).foreach { case Array(a, b) => assert(b._2 >= a._2) case _ => }
    // no single fitting item beats the optimum
    got.foreach { case (c, opt) =>
      items.filter(_._2 <= c).foreach { it => assert(it._3 <= opt) }
    }
  }

  test("q486: full-candidate scan proves discrete optimality") {
    val demand = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"), expr("c.c_custkey = o.o_custkey"))
      .groupBy(col("c.c_mktsegment").as("seg"),
        expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(count(lit(1)).as("d"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    def cost(ds: Seq[Long], s: Long): Long =
      ds.map(d => 3 * math.max(0L, d - s) + math.max(0L, s - d)).sum
    val got = q("q486_newsvendor_quantile").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val bySeg = demand.groupBy(_._1)
    assert(got.length === bySeg.size)
    got.foreach { case (seg, sStar, sMean, cStar, cMean, nDays) =>
      val ds = bySeg(seg).map(_._2).toSeq
      assert(nDays === ds.length.toLong)
      assert(sMean === ds.sum / ds.length)
      assert(cStar === cost(ds, sStar), s"cost at s* for $seg")
      assert(cMean === cost(ds, sMean), s"cost at mean for $seg")
      assert(cStar <= cMean, "newsvendor optimality vs mean stocking")
      // s* minimizes over ALL candidate stock levels (observed demands)
      ds.distinct.foreach { s => assert(cost(ds, s) >= cStar, s"candidate $s") }
      // and matches the critical-fractile definition
      val sorted = ds.sorted
      val want = sorted(((3 * ds.length + 3) / 4 - 1).max(0))
      assert(sStar === want, s"critical fractile for $seg")
    }
  }
}
