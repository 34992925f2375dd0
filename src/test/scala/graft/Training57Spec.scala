package graft

import org.apache.spark.sql.functions._

/** Invariants for the fifty-seventh wave (q338-q339): encoding
  * estimates recounted from collected values with the decision law,
  * and the Hill estimator re-derived with double-precision logs.
  */
class Training57Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q338: estimates recount and the recommendation follows the sizes") {
    val out = q("q338_encoding_planner").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    assert(out.keySet === Set("l_returnflag", "l_linestatus",
      "l_shipdate_str", "l_orderkey_str"))
    val flags = Tables(spark, dir, "lineitem")
      .select("l_returnflag").collect().map(_.getString(0))
    val (n, card, plain) =
      (flags.length.toLong, flags.distinct.length.toLong,
        flags.map(_.length.toLong).sum)
    val dict = (plain / n) * card +
      (n * math.ceil(math.log(card.toDouble) / math.log(2)).toLong + 7) / 8
    assert(out("l_returnflag") === ((n, card, plain, dict,
      if (dict < plain) "dictionary" else "plain")))
    // decision law on every row
    out.values.foreach { case (_, _, p, dct, rec) =>
      assert(rec === (if (dct < p) "dictionary" else "plain"))
    }
    // a 3-value flag must dictionary-encode (orderkey strings repeat
    // ~4x per order here, so dictionary legitimately wins there too —
    // the decision law above is the contract, not a fixed outcome)
    assert(out("l_returnflag")._5 === "dictionary")
  }

  test("q339: Hill alpha re-derives from double logs") {
    val r = q("q339_powerlaw_tail").collect().head
    val (nTail, sumLn, alpha) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val op = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val deg = op.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet.size).toMap
    val tail = deg.values.filter(_ >= 10).toSeq
    assert(nTail === tail.size.toLong)
    val expSum = tail.map(d0 => math.round(math.log(d0.toDouble) * 1e6)).sum
    assert(sumLn === expSum, "micro log sum")
    val dd = expSum - nTail * math.round(math.log(10.0) * 1e6)
    val expAlpha = 1000000L + (2 * 1000000000000L * nTail + dd) / (2 * dd)
    assert(alpha === expAlpha)
    assert(alpha > 1000000L, "alpha must exceed 1")
  }
}
