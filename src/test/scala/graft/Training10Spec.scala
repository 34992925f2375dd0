package graft

import org.apache.spark.sql.functions._

/** Invariants for the tenth wave (q166-q173) beyond the row/hash
  * oracle: each statistic is recomputed independently in plain JVM
  * Scala from the same collected inputs (different algorithm, same
  * answer), plus the structural identities a wrong implementation
  * would break (conservation, monotonicity, bounds).
  */
class Training10Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  /** The (x = epoch day, y = cents) daily series the trend queries share. */
  private lazy val daily: Array[(Long, Long)] = Tables(spark, dir, "lineitem")
    .select(
      expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT)").as("x"),
      expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
    .groupBy("x").agg(sum("cents").as("y"))
    .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).sortBy(_._1)

  test("q166: OLS slope/intercept match a JVM least-squares recount") {
    val r = q("q166_ols_trend").collect().head
    val n = daily.length.toDouble
    val sx = daily.map(_._1.toDouble).sum
    val sy = daily.map(_._2.toDouble).sum
    val sxx = daily.map(p => p._1.toDouble * p._1).sum
    val sxy = daily.map(p => p._1.toDouble * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    assert(r.getAs[Long]("n_days") == daily.length)
    assert(math.abs(r.getAs[Double]("slope_cents_per_day") - slope) < 1e-3,
      s"slope ${r.getAs[Double]("slope_cents_per_day")} vs $slope")
    assert(math.abs(r.getAs[Double]("intercept_cents") - intercept)
      <= math.abs(intercept) * 1e-6 + 1e-2)
  }

  test("q167: Theil-Sen slope is the exact lower median of a JVM pair sweep") {
    val r = q("q167_theilsen_slope").collect().head
    val slopes = (for {
      i <- daily.indices.iterator
      j <- (i + 1) until daily.length
    } yield {
      val num = 1000000L * (daily(j)._2 - daily(i)._2)
      val den = daily(j)._1 - daily(i)._1
      if (num >= 0) (2 * num + den) / (2 * den)
      else -((2 * -num + den) / (2 * den))
    }).toArray.sorted
    assert(r.getAs[Long]("n_pairs") == slopes.length.toLong)
    val k = (slopes.length + 1) / 2
    assert(r.getAs[Long]("ts_slope_micro") == slopes(k - 1),
      s"median ${r.getAs[Long]("ts_slope_micro")} vs ${slopes(k - 1)}")
    // robustness sanity: median lies within the pair-slope range
    assert(r.getAs[Long]("ts_slope_micro") >= slopes.head &&
      r.getAs[Long]("ts_slope_micro") <= slopes.last)
  }

  test("q168: lag-1 autocorrelation matches a JVM recount and is in [-1, 1]") {
    val r = q("q168_autocorr_lag1").collect().head
    val n = daily.length
    val mean = daily.map(_._2.toDouble).sum / n
    val dev = daily.map(_._2.toDouble - mean)
    val num = (0 until n - 1).map(i => dev(i) * dev(i + 1)).sum
    val den = dev.map(z => z * z).sum
    val r1 = r.getAs[Double]("r1")
    assert(math.abs(r1 - num / den) < 1e-4, s"r1 $r1 vs ${num / den}")
    assert(r1 >= -1.0 && r1 <= 1.0)
    assert(r.getAs[Long]("n_days") == n)
    val meanCents = r.getAs[Long]("mean_cents")
    assert(math.abs(meanCents - mean) <= 1.0)
  }

  test("q169: rule metrics are internally consistent and lift is recounted") {
    val rows = q("q169_basket_rules").collect()
    assert(rows.nonEmpty)
    val n = rows.head.getAs[Long]("n_orders")
    rows.foreach { r =>
      val (ab, a, b) = (r.getAs[Long]("supp_ab"), r.getAs[Long]("supp_a"), r.getAs[Long]("supp_b"))
      assert(ab >= 1 && ab <= math.min(a, b), s"support order violated: $r")
      assert(r.getAs[String]("brand_a") < r.getAs[String]("brand_b"))
      assert(r.getAs[Long]("conf_ab_ppm") == (2L * 1000000 * ab + a) / (2 * a))
      assert(r.getAs[Long]("lift_ppm") ==
        (2L * 1000000 * ab * n + a * b) / (2 * a * b))
    }
    // lift order is the output order
    val lifts = rows.map(_.getAs[Long]("lift_ppm"))
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y })
  }

  test("q170: class histogram conserves rows and k_anonymity is the true min") {
    val r = q("q170_k_anonymity").collect().head
    val custCount = Tables(spark, dir, "customer").count()
    assert(r.getAs[Long]("n_rows") == custCount)
    assert(r.getAs[Long]("k_anonymity") >= 1)
    assert(r.getAs[Long]("rows_lt5") < 5 * r.getAs[Long]("classes_lt5") + 1)
    val expectPpm =
      (2L * 1000000 * r.getAs[Long]("rows_lt5") + custCount) / (2 * custCount)
    assert(r.getAs[Long]("suppress_ppm") == expectPpm)
  }

  test("q171: KM curve starts at full risk, risk and survival both decrease") {
    val rows = q("q171_km_survival").collect().sortBy(_.getAs[Long]("t_days"))
    assert(rows.nonEmpty)
    val custCount = Tables(spark, dir, "orders").select("o_custkey").distinct().count()
    // first event time: everyone still at risk who didn't leave earlier
    assert(rows.head.getAs[Long]("n_risk") <= custCount)
    assert(rows.head.getAs[Long]("n_risk") > 0)
    val risks = rows.map(_.getAs[Long]("n_risk"))
    assert(risks.zip(risks.tail).forall { case (a, b) => a >= b }, "risk set must shrink")
    val lows = rows.map(r => Option(r.getAs[java.lang.Long]("log_s_micro")))
    val defined = lows.flatten.map(_.longValue)
    assert(defined.zip(defined.tail).forall { case (a, b) => a >= b },
      "log-survival must be non-increasing")
    assert(defined.forall(_ <= 0))
    // events at each output row
    assert(rows.forall(_.getAs[Long]("d_events") > 0))
  }

  test("q172: VaR/CVaR match a JVM full-sort recount") {
    val r = q("q172_cvar").collect().head
    val cents = Tables(spark, dir, "orders")
      .select(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("c"))
      .collect().map(_.getAs[Long]("c")).sorted
    val n = cents.length.toLong
    val k = (19 * n + 19) / 20
    val varC = cents((k - 1).toInt)
    val tail = cents.drop((k - 1).toInt) // m = n-k+1 top ranks
    val m = tail.length.toLong
    val cvar = (2 * tail.sum + m) / (2 * m)
    assert(r.getAs[Long]("n_orders") == n)
    assert(r.getAs[Long]("k_rank") == k)
    assert(r.getAs[Long]("var_cents") == varC)
    assert(r.getAs[Long]("tail_n") == m)
    assert(r.getAs[Long]("cvar_cents") == cvar, s"cvar ${r.getAs[Long]("cvar_cents")} vs $cvar")
    assert(r.getAs[Long]("cvar_cents") >= r.getAs[Long]("var_cents"))
  }

  test("q173: AUC matches a JVM pairwise recount (doubled-midrank identity)") {
    val r = q("q173_mwu_auc").collect().head
    val ev = Tables(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(expr("CAST(round(value * 100, 0) AS BIGINT)").as("c"), col("event_type"))
      .collect()
    val a = ev.filter(_.getAs[String]("event_type") == "click").map(_.getAs[Long]("c"))
    val b = ev.filter(_.getAs[String]("event_type") == "purchase").map(_.getAs[Long]("c"))
    assert(r.getAs[Long]("n_click") == a.length.toLong)
    assert(r.getAs[Long]("n_purchase") == b.length.toLong)
    // brute-force doubled U: 2 per win, 1 per tie (O(n log n) via sort+binary search)
    val bs = b.sorted
    def countLE(x: Long, strict: Boolean): Long = {
      var lo = 0; var hi = bs.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (if (strict) bs(mid) < x else bs(mid) <= x) lo = mid + 1 else hi = mid
      }
      lo.toLong
    }
    val u2 = a.map(x => countLE(x, strict = true) + countLE(x, strict = false)).sum
    assert(r.getAs[Long]("u_doubled") == u2, s"u2 ${r.getAs[Long]("u_doubled")} vs $u2")
    val n1 = a.length.toLong; val n2 = b.length.toLong
    assert(r.getAs[Long]("auc_ppm") ==
      (2 * 1000000L * u2 + 2 * n1 * n2) / (4 * n1 * n2))
    assert(r.getAs[Long]("auc_ppm") >= 0 && r.getAs[Long]("auc_ppm") <= 1000000)
  }
}
