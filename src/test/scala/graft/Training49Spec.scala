package graft

import org.apache.spark.sql.functions._

/** Invariants for the forty-ninth wave (q320-q322): format round-trips
  * recounted from the parquet originals, ORC pushdown visible in the
  * read plan, and the streaming sketch gated/recounted against batch.
  */
class Training49Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q320: ORC round-trip recounts from the parquet original") {
    val out = q("q320_orc_roundtrip").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("c"),
        col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 != "N")
    val expect = li.groupBy(_._1).view.mapValues(g =>
      (g.length.toLong, g.map(_._2).sum, g.map(_._3).max)).toMap
    assert(out === expect)
  }

  test("q320: the ORC read pushes the filter into the scan") {
    q("q320_orc_roundtrip").collect() // ensure the ORC dir exists
    val orcDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft_orc_${Integer.toHexString(dir.hashCode)}").toString
    val p = spark.read.orc(orcDir)
      .filter(col("l_returnflag") =!= "N")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters") && p.contains("l_returnflag"), p)
  }

  test("q321: JSONL round-trip recounts from the parquet original") {
    val out = q("q321_jsonl_roundtrip").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("c"),
        col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = o.groupBy(_._1).view.mapValues(g =>
      (g.length.toLong, g.map(_._2).sum, g.map(_._3).min)).toMap
    assert(out === expect)
  }

  test("q322: streaming bands gate holds and day counts equal batch") {
    val out = q("q322_stream_quantile_bands").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Boolean]("band10_ok") &&
      r.getAs[Boolean]("band50_ok") && r.getAs[Boolean]("band90_ok")),
      "every streaming-sketch rank gate must hold")
    val batchN = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("day")).collect()
      .groupBy(_.get(0).toString).view.mapValues(_.length.toLong).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n") === batchN(r.get(0).toString),
        s"day ${r.get(0)}: streaming count must equal batch")
    }
  }
}
