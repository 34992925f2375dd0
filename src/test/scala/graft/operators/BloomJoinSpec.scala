package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BloomJoin.semiJoinLong equals the plain semi-join (false positives
  * removed by the exact join), including when both sides use the same
  * key column name.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("equals plain semi-join; same-name keys supported") {
    val fact = (1L to 5000L).map(i => (i % 997, i)).toDF("k", "v")
    val dim = (1L to 300L).map(i => i * 3).toDF("k")
    val expected = fact.join(dim.withColumnRenamed("k", "dk"),
      col("k") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = BloomJoin.semiJoinLong(fact, "k", dim, "k", expectedKeys = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
