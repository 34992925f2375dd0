package graft

import org.apache.spark.sql.functions._

/** Invariants for the seventy-seventh wave:
  *
  *  - q397: trailing-hour counts re-derive via a JVM two-pointer sweep
  *    (independent of both engines' RANGE frame machinery);
  *  - q398: lineage is exprId-correct on an ALIASED SELF-JOIN (where
  *    name matching would be wrong), and the declared star edges
  *    re-derive;
  *  - q399: the Gram matrix re-derives from a JVM accumulation, is
  *    symmetric by construction, and the trace equals Σ‖x‖².
  */
class Training77Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q397: trailing-hour census re-derives via a JVM two-pointer sweep") {
    val rows = Tables(spark, dir, "events").selectExpr("user_id",
      "unix_micros(ts)", "CAST(round(value * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hourUs = 3600000000L
    val per = rows.groupBy(_._1).values.flatMap { g =>
      val ev = g.sortBy(_._2)
      ev.indices.map { i =>
        val lo = ev(i)._2 - hourUs
        val win = ev.take(i + 1).filter(_._2 >= lo)
        (win.length.toLong, win.map(_._3).sum)
      }
    }.toSeq
    val want = per.groupBy(_._1).view.mapValues { g =>
      (g.size.toLong, g.map(_._2).sum) }.toMap
    val got = q("q397_interval_range_frame").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    assert(got.keySet.exists(_ > 1L), "some trailing window must exceed 1")
  }

  test("q398: exprId lineage survives an aliased self-join; star edges re-derive") {
    val o = Tables(spark, dir, "orders")
    // self-join where both sides expose a column with the SAME name:
    // name-based lineage would conflate them; exprId tracking must
    // attribute left_price and right_price to orders.o_totalprice
    // independently and the key columns correctly
    val selfJoin = o.as("a")
      .join(o.as("b"), col("a.o_orderkey") === col("b.o_custkey"))
      .select(col("a.o_totalprice").as("left_price"),
        col("b.o_totalprice").as("right_price"),
        (col("a.o_totalprice") + col("b.o_totalprice")).as("both"))
    val edges = graft.operators.Lineage.columnLineage(selfJoin)
    assert(edges.toSet === Set(
      ("left_price", "orders", "o_totalprice"),
      ("right_price", "orders", "o_totalprice"),
      ("both", "orders", "o_totalprice")))
    val got = q("q398_column_lineage").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      ("n_name", "nation", "n_name"),
      ("n_orders", "orders", "o_orderkey"),
      ("revenue", "lineitem", "l_discount"),
      ("revenue", "lineitem", "l_extendedprice")))
  }

  test("q399: Gram matrix re-derives in the JVM; trace is sum of norms") {
    val vs = Tables(spark, dir, "embeddings").selectExpr(
      """transform(embedding,
         x -> cast(round(cast(x as double) * 1000000, 0) as bigint))""")
      .collect().map(_.getSeq[Long](0).toArray)
    val dim = vs.head.length
    val g = Array.ofDim[Long](dim, dim)
    vs.foreach { v =>
      for (i <- 0 until dim; j <- i until dim) g(i)(j) += v(i) * v(j)
    }
    val trace = (0 until dim).map(i => g(i)(i)).sum
    val wantTop = (for (i <- 0 until dim; j <- (i + 1) until dim)
      yield (i.toLong, j.toLong, g(i)(j)))
      .sortBy { case (i, j, v) => (-math.abs(v), i, j) }.take(10)
    val got = q("q399_gram_matrix").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val traceRow = got.find(r => r._1 == -1L && r._2 == -1L).get
    assert(traceRow._3 === trace, "trace = sum of squared norms")
    assert(got.filter(_._1 >= 0).toSeq === wantTop)
  }
}
