package graft

import org.apache.spark.sql.functions._

/** Invariants for the fifty-second wave (q328-q330): modality, rank
  * selection, and rollup masks recounted from collected rows.
  */
class Training52Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  private def lineitem() = Tables(spark, dir, "lineitem")
    .select(col("l_returnflag"),
      expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("cents"),
      col("l_quantity").cast("long").as("q"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("q328: mode gate holds and max multiplicity recounts") {
    val out = q("q328_mode_contract").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.values.forall(_._2), "mode must be modal in every group")
    lineitem().groupBy(_._1).foreach { case (f, rows) =>
      val maxMult = rows.groupBy(_._3).values.map(_.size).max.toLong
      assert(out(f)._1 === maxMult, s"flag $f max multiplicity")
    }
  }

  test("q329: discrete percentiles are the values at ceil(p*n) by sorting") {
    val out = q("q329_percentile_disc").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    lineitem().groupBy(_._1).foreach { case (f, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      def at(num: Int, den: Int) = sorted((n * num + den - 1) / den - 1)
      assert(out(f) === ((n.toLong, at(1, 4), at(1, 2), at(3, 4))), s"flag $f")
      // selected values must be actual data values (closure law)
      assert(Seq(out(f)._2, out(f)._3, out(f)._4).forall(sorted.contains),
        s"flag $f: disc percentiles must be members")
    }
  }

  test("q330: rollup masks and subtotals recount") {
    val out = q("q330_grouping_id").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val rows = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // leaf rows: gid 0
    rows.groupBy(r => (r._1, r._2)).foreach { case ((rf, ls), g) =>
      assert(out((rf, ls)) === ((0L, g.size.toLong, g.map(_._3).sum)))
    }
    // level-1 subtotals: gid 1
    rows.groupBy(_._1).foreach { case (rf, g) =>
      assert(out((rf, "<all>")) === ((1L, g.size.toLong, g.map(_._3).sum)))
    }
    // grand total: gid 3
    assert(out(("<all>", "<all>")) ===
      ((3L, rows.length.toLong, rows.map(_._3).sum)))
  }
}
