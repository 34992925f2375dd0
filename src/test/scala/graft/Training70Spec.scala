package graft

import org.apache.spark.sql.functions._

import graft.operators.AhoCorasick

/** Invariants for the seventieth wave:
  *
  *  - q376: the parameter marker is LIVE — binding a different cut
  *    changes the census, and the declared binding matches a direct
  *    DataFrame computation;
  *  - q377: automaton counts re-derive by naive indexOf sliding over
  *    the collected corpus (independent algorithm), and the automaton
  *    reports ALL overlapping occurrences (suffix-link unit test);
  *  - q378: coefficients re-derive via BigInt Cramer on the RAW 3×3
  *    normal equations (uncentered — a different algebraic path than
  *    the query's n-scaled centered 2×2), and double-precision least
  *    squares agrees to within the micro rounding.
  */
class Training70Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q376: named parameter binds live; result matches DataFrame form") {
    val got = q("q376_execute_immediate").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") >= 150000.0)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    // rebind with a cut above the max price: zero groups survive —
    // the marker is a real runtime parameter, not baked-in text
    val none = spark.sql(
      "EXECUTE IMMEDIATE graft_stmt USING 1000000000.0 AS cut")
    assert(none.count() === 0L)
  }

  test("q377: counts re-derive by naive indexOf; overlaps all reported") {
    val terms = Vector("a", "agg", "hash join", "join", "row", "scan",
      "slow query", "stream", "table scan", "val")
    val texts = Tables(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    def naive(text: String, term: String): Long = {
      var i = text.indexOf(term); var c = 0L
      while (i >= 0) { c += 1; i = text.indexOf(term, i + 1) }
      c
    }
    val want = terms.map(t =>
      t -> ((texts.map(naive(_, t)).sum,
        texts.count(_.contains(t)).toLong))).toMap
    val got = q("q377_dictionary_match").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    assert(got("join")._1 >= got("hash join")._1,
      "nested occurrences must be included in the inner term's count")
    // suffix-link unit test: overlapping and nested matches all fire
    val ac = new AhoCorasick(Vector("a", "aa", "aaa", "ba"))
    assert(ac.countAll("aaaa").toSeq === Seq(4L, 3L, 2L, 0L))
    assert(ac.countAll("baaa").toSeq === Seq(3L, 2L, 1L, 1L))
  }

  test("q378: coefficients re-derive via BigInt Cramer on raw 3x3 normal equations") {
    val rows = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .selectExpr("CAST(l_quantity AS BIGINT)",
        "CAST(round(p_retailprice * 100, 0) AS BIGINT) div 100",
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) div 100")
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)),
        BigInt(r.getLong(2))))
    val n = BigInt(rows.length)
    val (sx1, sx2, sy) = (rows.map(_._1).sum, rows.map(_._2).sum,
      rows.map(_._3).sum)
    val sx1x1 = rows.map(r => r._1 * r._1).sum
    val sx2x2 = rows.map(r => r._2 * r._2).sum
    val sx1x2 = rows.map(r => r._1 * r._2).sum
    val sx1y = rows.map(r => r._1 * r._3).sum
    val sx2y = rows.map(r => r._2 * r._3).sum
    // raw (uncentered) 3x3 system M·[b0,b1,b2] = v, Cramer over BigInt
    val m = Array(Array(n, sx1, sx2), Array(sx1, sx1x1, sx1x2),
      Array(sx2, sx1x2, sx2x2))
    val v = Array(sy, sx1y, sx2y)
    def det(a: Array[Array[BigInt]]): BigInt =
      a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
        a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
        a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))
    val d = det(m)
    def repl(j: Int) = det(Array.tabulate(3, 3)((r, c) =>
      if (c == j) v(r) else m(r)(c)))
    def micro(num: BigInt, den: BigInt): Long = {
      val (s, a) = (num.signum * den.signum, (num * 1000000).abs)
      (s * ((2 * a + den.abs) / (2 * den.abs))).toLong
    }
    val (wantB1, wantB2) = (micro(repl(1), d), micro(repl(2), d))
    val r = q("q378_multiple_regression").collect().head
    assert(r.getLong(0) === rows.length.toLong)
    assert(r.getLong(1) === wantB1, "b1_micro")
    assert(r.getLong(2) === wantB2, "b2_micro")
    // intercept and fit: double-precision cross-check within rounding
    val b0 = (sy.toDouble - wantB1 / 1e6 * sx1.toDouble -
      wantB2 / 1e6 * sx2.toDouble) / n.toDouble
    assert(math.abs(r.getLong(3) / 1e6 - b0) < 1e-3, "b0 micro vs double")
    assert(r.getLong(4) > 0L && r.getLong(4) <= 1000000L, "r2 in (0,1]")
  }
}
