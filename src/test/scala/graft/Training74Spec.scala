package graft

import org.apache.spark.sql.functions._

/** Invariants for the seventy-fourth wave:
  *
  *  - q388: distances re-derive via JVM Dijkstra (a DIFFERENT
  *    algorithm than the declared Bellman–Ford rounds) restricted to
  *    ≤4 hops;
  *  - q389: the HT estimate re-derives in BigInt and lands within 5%
  *    of the exact total (systematic PPS on a 64-step grid);
  *  - q390: the two tenant slices are disjoint, each equals a direct
  *    filter, and rebinding the variable really changes the view.
  */
class Training74Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q388: hop-bounded Dijkstra re-derives the Bellman-Ford distances") {
    // sf0.01 so the cnt>=2 graph is non-trivial
    val d01 = "/root/testdata/sf0.01"
    val op = Tables(spark, d01, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val ew = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 2)
      .selectExpr("u", "v", "1000000 div cnt AS w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val adj = (ew ++ ew.map(e => (e._2, e._1, e._3)))
      .groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val src = adj.keySet.toSeq.sortBy(n => (md5hex(n.toString), n)).head
    // Dijkstra over (node, hops) state, hops <= 4
    val best = scala.collection.mutable.Map((src, 0) -> 0L)
    val pq = scala.collection.mutable.PriorityQueue(
      (0L, src, 0))(Ordering.by(x => -x._1))
    while (pq.nonEmpty) {
      val (dist, node, hops) = pq.dequeue()
      if (best.get((node, hops)).contains(dist) && hops < 4)
        adj.getOrElse(node, Array.empty[(Long, Long)]).foreach { case (v, w) =>
          val nd = dist + w
          if (best.get((v, hops + 1)).forall(_ > nd)) {
            best((v, hops + 1)) = nd; pq.enqueue((nd, v, hops + 1))
          }
        }
    }
    val byNode = best.toSeq.map { case ((n, _), dist) => (n, dist) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = byNode.toSeq.filter(_._2 > 0)
      .sortBy { case (n, dist) => (dist, n) }.take(10)
    val got = SparkEntry.allDefs.find(_.name == "q388_weighted_shortest_path")
      .get.fn(spark, d01).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === want)
    assert(got.nonEmpty, "the cnt>=2 graph must be non-trivial at sf0.01")
  }

  test("q389: HT estimate re-derives in BigInt and is within 5%") {
    val parts = Tables(spark, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
        .as("w"), sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
      .orderBy("l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = parts.map(_._2).sum
    val exactQty = parts.map(_._3).sum
    val step = math.max(total / 64, 1L)
    var cum = 0L
    var ht = BigInt(0); var n = 0
    parts.foreach { case (_, w, qty) =>
      val before = cum; cum += w
      if (cum / step > before / step) {
        n += 1
        ht += (if (w >= step) BigInt(qty)
               else BigInt(qty) * step / w)
      }
    }
    val r = q("q389_horvitz_thompson").collect().head
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === exactQty)
    assert(BigInt(r.getLong(2)) === ht, "HT estimate")
    assert(math.abs(r.getLong(3)) < 50000L,
      s"estimate should be within 5%: err_ppm=${r.getLong(3)}")
  }

  test("q390: slices are disjoint, match direct filters, and rebind live") {
    val got = q("q390_row_policy_view").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = Seq("BUILDING", "MACHINERY").map { seg =>
      val rows = Tables(spark, dir, "customer")
        .filter(col("c_mktsegment") === seg)
      seg -> ((rows.count(),
        rows.agg(expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)"))
          .head().getDouble(0)))
    }.toMap
    assert(got === want)
    assert(got("BUILDING")._1 > 0 && got("MACHINERY")._1 > 0)
    assert(got("BUILDING") !== got("MACHINERY"),
      "rebinding must change the view's rows")
    // the view itself reflects the CURRENT variable value
    spark.sql("SET VAR graft_tenant = 'FURNITURE'")
    val n3 = spark.sql("SELECT count(*) FROM graft_rls").head().getLong(0)
    assert(n3 === Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "FURNITURE").count())
  }
}
