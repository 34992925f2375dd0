package graft

import org.apache.spark.sql.functions._

/** Invariants for the seventy-eighth wave:
  *
  *  - q400: the culprit set re-derives via a JVM replay of the
  *    EXISTS/NOT-EXISTS semantics (per-order supplier lateness maps),
  *    and every reported supplier really was the ONLY late supplier
  *    on each counted order;
  *  - q401: the variant explode census equals a from_json recount, and
  *    the plan really goes through a Generate over variant_explode;
  *  - bonus plan pin: rank-limit windows compile to the
  *    WindowGroupLimit optimization (Spark 3.5+), so top-k-per-group
  *    never materializes full partitions.
  */
class Training78Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q400: JVM replay of the only-late-supplier semantics") {
    val li = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("l_orderkey", "l_suppkey",
        """CASE WHEN datediff(CAST(l_shipdate AS DATE),
           CAST(o_orderdate AS DATE)) > 90 THEN 1 ELSE 0 END""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val perOrder = li.groupBy(_._1).view.mapValues { g =>
      g.groupBy(_._2).view.mapValues(_.exists(_._3 == 1)).toMap
    }.toMap
    val culpritCounts = scala.collection.mutable.Map.empty[Long, Long]
    perOrder.foreach { case (_, supps) =>
      val late = supps.filter(_._2).keys.toSeq
      if (supps.size > 1 && late.size == 1)
        culpritCounts(late.head) = culpritCounts.getOrElse(late.head, 0L) + 1
    }
    val names = Tables(spark, dir, "supplier")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = culpritCounts.toSeq
      .map { case (sk, n) => (names(sk), n) }
      .sortBy { case (nm, n) => (-n, nm) }.take(20)
    val got = q("q400_waiting_orders").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === want)
    assert(got.nonEmpty, "some supplier must have kept an order waiting")
  }

  test("q401: census equals a from_json recount; plan uses variant_explode") {
    val df = q("q401_variant_explode")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("variant_explode"),
      s"plan must generate via variant_explode:\n${plan.take(600)}")
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = Tables(spark, dir, "events")
      .selectExpr("get_json_object(props, '$.k')")
      .collect().map(_.getString(0).toLong)
    assert(got.toSeq === Seq(("k", want.length.toLong, want.min, want.max)))
  }

  test("rank-limit windows compile to WindowGroupLimit") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc)
    val topk = Tables(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"top-k-per-group must use the group-limit optimization:\n" +
        plan.take(800))
  }
}
