package graft

import org.apache.spark.sql.functions._

/** q490 (approx-IQR contract twin): the contract booleans must hold on
  * harness data, and n_exact must match an INDEPENDENT JVM replay of
  * the reference's sequential IQR filter (in-memory sort + linear
  * interpolation — a different algorithm than the SQL percentile
  * aggregate, so a formula bug shared by both oracle dialects can't
  * hide; the r7 Kruskal-Wallis lesson).
  */
class Training111Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def jvmQuartiles(v: Seq[Double]): (Double, Double) = {
    val s = v.sorted
    def q(p: Double): Double = {
      val h = (s.size - 1) * p
      val lo = math.floor(h).toInt
      val hi = math.ceil(h).toInt
      s(lo) + (h - lo) * (s(hi) - s(lo))
    }
    (q(0.25), q(0.75))
  }

  /** One sequential upper-IQR pass (pandas semantics: skip the group
    * when <2 non-null values or IQR == 0; drop nulls in filtered
    * groups, keep them in skipped groups).
    */
  private def jvmPass[R](
      rows: Seq[R], group: R => String, value: R => Option[Double]): Seq[R] =
    rows.groupBy(group).toSeq.flatMap { case (_, g) =>
      val vals = g.flatMap(value(_))
      if (vals.size < 2) g
      else {
        val (q1, q3) = jvmQuartiles(vals.map(identity))
        if (q3 - q1 == 0.0) g
        else g.filter(r => value(r).exists(_ <= q3 + 1.5 * (q3 - q1)))
      }
    }

  test("q490: all contract booleans TRUE; n_exact matches the JVM replay") {
    val out = SparkEntry.queries("q490_iqr_approx_contract")(spark, dir)
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Boolean]("q1_rank_ok"), s"q1 rank contract broke: $r")
      assert(r.getAs[Boolean]("q3_rank_ok"), s"q3 rank contract broke: $r")
      assert(r.getAs[Boolean]("retention_ok"), s"retention envelope broke: $r")
    }
    val gotExact = out.map(r =>
      r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_exact")).toMap

    case class Li(flag: String, qty: Option[Double], price: Option[Double])
    val base = Tables(spark, dir, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => Li(r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq
    val afterQty = jvmPass[Li](base, _.flag, _.qty)
    val afterPrice = jvmPass[Li](afterQty, _.flag, _.price)
    val want = afterPrice.groupBy(_.flag).map { case (f, g) => f -> g.size.toLong }
    assert(gotExact === want)
  }

  test("q490: the sketch path genuinely differs from exact (contract is not vacuous)") {
    // the retention envelope only means something if exact=false takes
    // a DIFFERENT quantile path: exact `percentile` interpolates between
    // data values, the t-digest sketch returns actual data values — on
    // the near-continuous price column at least one group's quartile
    // must differ between the two
    val li = Tables(spark, dir, "lineitem")
      .select("l_returnflag", "l_extendedprice")
    def bounds(fn: String): Map[String, Seq[Double]] =
      li.groupBy("l_returnflag")
        .agg(expr(fn).as("qs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val approx = bounds("approx_percentile(l_extendedprice, array(0.25D, 0.75D), 10000)")
    val exact = bounds("percentile(l_extendedprice, array(0.25D, 0.75D))")
    assert(approx.keySet === exact.keySet)
    assert(approx.exists { case (k, v) => v != exact(k) },
      s"sketch and exact quartiles identical everywhere: $approx")
  }
}
