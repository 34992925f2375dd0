package graft

import org.apache.spark.sql.functions._

/** Invariants for the eighty-eighth wave:
  *
  *  - q427: the waterline re-derives via a JVM water-filling replay,
  *    nobody gets more than demanded, the grant never exceeds
  *    capacity, and every fully-served tenant sits below the line;
  *  - q428: star-EXCEPT really prunes the named columns from the
  *    intermediate schema, and the census equals the plain form.
  */
class Training88Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q427: JVM water-filling replay; feasibility invariants") {
    val demands = Tables(spark, dir, "orders")
      .groupBy("o_custkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (c, d) => (d, c) }
    val cap = demands.map(_._2).sum / 2
    // replay: first index where serving the remainder at this level
    // exceeds capacity
    val n = demands.length
    var cum = 0L; var water = -1L; var i = 0
    while (i < n && water < 0) {
      val d = demands(i)._2
      if (cum + (n - i).toLong * d > cap)
        water = (cap - cum) / (n - i)
      else { cum += d; i += 1 }
    }
    assert(water >= 0, "cap < total demand must force a waterline")
    val granted = demands.map { case (_, d) => math.min(d, water) }
    val r = q("q427_maxmin_fair_allocation").collect().head
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === demands.map(_._2).sum)
    assert(r.getLong(2) === granted.sum, "total granted")
    assert(r.getLong(3) === water, "waterline")
    assert(r.getLong(4) === demands.count(_._2 > water).toLong)
    // feasibility: grant within capacity; max-min property: capped
    // tenants all receive exactly the waterline
    assert(granted.sum <= cap)
    demands.zip(granted).foreach { case ((_, d), g) =>
      assert(g <= d)
      if (d > water) assert(g === water)
    }
  }

  test("q428: EXCEPT prunes the schema; census matches the plain form") {
    Tables(spark, dir, "orders").selectExpr("o_orderkey",
      "named_struct('pri', o_orderpriority, 'cents', CAST(1 AS BIGINT)) AS payload",
      "o_orderstatus", "o_custkey")
      .createOrReplaceTempView("graft_star_ex_spec")
    val pruned = spark.sql(
      "SELECT * EXCEPT (o_custkey, o_orderstatus) FROM graft_star_ex_spec")
    assert(pruned.columns.toSeq === Seq("o_orderkey", "payload"))
    val got = q("q428_select_except_star").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = Tables(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)),
        sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")),
        countDistinct("o_orderkey"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq)
  }
}
