package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariants for the eighth wave (q151-q153) beyond the row/hash
  * oracle: attribution weights must conserve (≤ 1e6 ppm per purchase,
  * exactly 1e6 when the middle splits evenly), the skyline must be
  * mutually non-dominated AND complete, and the weighted median must
  * match a JVM recount.
  */
class Training8Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q151: per-purchase weights conserve and touch types are only click/view") {
    // rebuild the per-touch weighting exactly as the query does and
    // check conservation per purchase: sum of ppm weights is 1e6 for
    // n <= 2, and 800000 + (n-2)*floor(200000/(n-2)) otherwise
    val ev = Tables(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"))
    val tch = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("tid"), col("ts").as("tts"))
    val j = p.join(tch, Seq("user_id"))
      .filter(col("tts") < col("pts") &&
        col("tts") >= col("pts") - expr("INTERVAL 7 DAY"))
    val w = Window.partitionBy("pid")
    val perPurchase = j
      .withColumn("pos", row_number().over(w.orderBy(col("tts").asc, col("tid").asc)).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("weight_ppm",
        expr("""CASE WHEN n = 1 THEN 1000000L
                     WHEN n = 2 THEN 500000L
                     WHEN pos = 1 OR pos = n THEN 400000L
                     ELSE 200000L div (n - 2) END"""))
      .groupBy("pid", "n").agg(sum("weight_ppm").as("total_ppm"))
      .collect()
    assert(perPurchase.nonEmpty)
    perPurchase.foreach { r =>
      val n = r.getAs[Long]("n")
      val expected =
        if (n <= 2) 1000000L else 800000L + (n - 2) * (200000L / (n - 2))
      assert(r.getAs[Long]("total_ppm") == expected, s"pid ${r.get(0)} n=$n")
    }
    val types = q("q151_attribution").select("touch_type").collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("click", "view")))
  }

  test("q152: skyline members are mutually non-dominated and no outsider belongs") {
    val sky = q("q152_skyline").collect()
      .map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("qty_c"), r.getAs[Long]("price_c")))
    assert(sky.nonEmpty)
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._2 >= b._2 && a._3 <= b._3 && (a._2 > b._2 || a._3 < b._3)
    for (a <- sky; b <- sky) assert(!dominates(a, b), s"$a dominates $b inside the skyline")
    // completeness: every supplier outside the skyline is dominated
    val centsOf = "CAST(round(%s * 100, 0) AS BIGINT)"
    val all = Tables(spark, dir, "lineitem").groupBy("l_suppkey").agg(
      sum(expr(centsOf.format("l_quantity"))).as("q"),
      sum(expr(centsOf.format("l_extendedprice"))).as("p"))
      .collect().map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("q"), r.getAs[Long]("p")))
    val skySet = sky.map(_._1).toSet
    all.filterNot(s => skySet(s._1)).foreach { out =>
      assert(sky.exists(m => dominates(m, out)), s"$out undominated but excluded")
    }
  }

  test("q153: weighted median matches a JVM recount per flag") {
    val rows = q("q153_weighted_median").collect()
    assert(rows.nonEmpty)
    val data = Tables(spark, dir, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0),
        math.round(r.getDouble(1) * 100), math.round(r.getDouble(2) * 100)))
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val grp = data.filter(_._1 == flag).map(t => (t._2, t._3)).sortBy(_._1)
      val tot = grp.map(_._2).sum
      var cum = 0L
      val med = grp.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      assert(r.getAs[Long]("wmedian_c") == med, flag)
      assert(r.getAs[Long]("total_w") == tot, flag)
    }
  }
}
