package graft

import org.apache.spark.sql.functions._

/** Invariants for the twenty-sixth wave (q233-q234): the CDC stream
  * against a JVM map-diff of the two snapshots it was derived from
  * (not just the oracle's closed form), and the retention plan's
  * self-consistency with the committed chain.
  */
class Training26Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q233: change stream equals a JVM map-diff of the two committed snapshots") {
    val got = q("q233_table_changes").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    // diff the ACTUAL committed version directories, independent of the
    // query's own join
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft_cdc_${Integer.toHexString(dir.hashCode)}").toString
    def snap(v: Int) = spark.read.parquet(s"$root/v$v")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (v0, v1) = (snap(0), snap(1))
    val want = ((v0.keySet ++ v1.keySet).flatMap { k =>
      (v0.get(k), v1.get(k)) match {
        case (Some(o), Some(n)) if o != n => Some(k -> (("update", Some(o), Some(n))))
        case (Some(o), None)              => Some(k -> (("delete", Some(o), None)))
        case (None, Some(n))              => Some(k -> (("insert", None, Some(n))))
        case _                            => None
      }
    }).toMap
    assert(got === want)
    assert(got.nonEmpty && got.values.exists(_._1 == "update")
      && got.values.exists(_._1 == "insert"))
  }

  test("q234: retention plan matches the chain it just committed") {
    val plan = q("q234_snapshot_retention").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft_ret_${Integer.toHexString(dir.hashCode)}").toString
    assert(graft.sources.Sinks.snapshotVersions(root) === Seq(0L, 1L, 2L))
    // counts agree with the actual version directories
    (0 to 2).foreach { v =>
      assert(plan(v.toLong)._1 === spark.read.parquet(s"$root/v$v").count())
    }
    // keep-last-2: exactly the oldest version expires
    assert(plan.view.mapValues(_._2).toMap === Map(0L -> true, 1L -> false, 2L -> false))
  }
}
