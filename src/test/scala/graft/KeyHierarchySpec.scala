package graft

import graft.operators.KeyHierarchy

/** Closed-form arithmetic-hierarchy expressions (q200/q426 scale
  * dispatch): the CASE-tree depth/root/path-product must agree with an
  * independent imperative JVM walk on adversarial keys (power
  * boundaries, 0, Long.MaxValue), and flipping the dispatch branch on
  * the declared queries must not change a single output row.
  */
class KeyHierarchySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val limitKey = "spark.graft.hierarchy.recursionLimit"

  // independent walk: explicit divide loop, no digit/CASE reasoning
  private def jvmWalk(k: Long, base: Long): (Long, Long, Long) = {
    var node = k
    var depth = 0L
    var units = 1L
    while (node >= base) {
      units *= node % 3 + 1
      node /= base
      depth += 1
    }
    (node, depth, units)
  }

  private val adversarial: Seq[Long] = Seq(
    0L, 1L, 3L, 4L, 5L, 9L, 10L, 15L, 16L, 63L, 64L, 99L, 100L, 999L,
    1000L, 4095L, 4096L, 65535L, 65536L, 999999L, 1000000L,
    1000000000L, 4611686018427387903L, // 4^31 - 1
    4611686018427387904L,              // 4^31
    999999999999999999L, 1000000000000000000L, Long.MaxValue)

  test("depth/root/path-product CASE trees match the JVM walk") {
    import spark.implicits._
    val df = adversarial.toDF("k")
    for (base <- Seq(4L, 10L)) {
      val got = df.selectExpr(
        "k",
        s"CAST(${KeyHierarchy.rootSql("k", base)} AS BIGINT) AS root",
        s"CAST(${KeyHierarchy.depthSql("k", base)} AS BIGINT) AS depth",
        "CAST(" +
          KeyHierarchy.pathProductSql("k", base, n => s"($n % 3 + 1)") +
          " AS BIGINT) AS units")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      for (k <- adversarial)
        assert(got(k) === jvmWalk(k, base), s"base=$base k=$k")
    }
  }

  private def rows(name: String, forceClosed: Boolean): Seq[String] = {
    spark.conf.set(limitKey, if (forceClosed) "0" else Long.MaxValue.toString)
    try SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    finally spark.conf.unset(limitKey)
  }

  test("q200: closed form is row-identical to the recursive branch") {
    val rec = rows("q200_recursive_rollup", forceClosed = false)
    val cf = rows("q200_recursive_rollup", forceClosed = true)
    assert(rec.nonEmpty)
    assert(cf === rec)
  }

  test("q426: closed form is row-identical to the recursive branch") {
    val rec = rows("q426_bom_explosion", forceClosed = false)
    val cf = rows("q426_bom_explosion", forceClosed = true)
    assert(rec.nonEmpty)
    assert(cf === rec)
  }
}
