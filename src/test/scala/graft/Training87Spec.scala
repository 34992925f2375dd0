package graft

import org.apache.spark.sql.functions._

/** Invariants for the eighty-seventh wave:
  *
  *  - q425: the per-slab fits and the epsilon audit re-derive in
  *    BigInt (full replay of every slab), and epsilon genuinely beats
  *    the no-model baseline (max error ≪ slab width);
  *  - q426: the explosion re-derives via a JVM tree walk with
  *    multiplied units, and additive rollup would disagree (the
  *    multiplicative semantics is load-bearing).
  */
class Training87Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q425: full BigInt replay of slab fits and epsilon") {
    val keys = Tables(spark, dir, "lineitem")
      .selectExpr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
      .collect().map(_.getLong(0)).distinct.sorted
    val n = keys.length
    val slabW = math.max(n / 64, 1)
    val bySlab = keys.zipWithIndex.groupBy { case (_, r) => r / slabW }
    var maxEps = 0L; var sumEps = BigInt(0)
    bySlab.toSeq.sortBy(_._1).foreach { case (_, rows) =>
      val m = BigInt(rows.length)
      val sk = rows.map(r => BigInt(r._1)).sum
      val sr = rows.map(r => BigInt(r._2)).sum
      val skk = rows.map(r => BigInt(r._1) * r._1).sum
      val skr = rows.map(r => BigInt(r._1) * r._2).sum
      val den = m * skk - sk * sk
      val num = m * skr - sk * sr
      def halfUp(a: BigInt, b: BigInt): BigInt =
        if (a.signum >= 0) (2 * a + b) / (2 * b)
        else -((2 * (-a) + b) / (2 * b))
      val b = halfUp(num * 1000000, den)
      val a = halfUp(1000000 * sr - b * sk, m)
      val eps = rows.map { case (k, r) =>
        (((a + b * k) / 1000000) - r).abs.toLong }.max
      maxEps = math.max(maxEps, eps); sumEps += eps
    }
    val meanEps = ((2 * sumEps + bySlab.size) / (2 * bySlab.size)).toLong
    val r = q("q425_learned_index_error").collect().head
    assert(r.getLong(0) === bySlab.size.toLong)
    assert(r.getLong(1) === n.toLong)
    assert(r.getLong(2) === maxEps, "max epsilon")
    assert(r.getLong(3) === meanEps, "mean epsilon")
    assert(maxEps < slabW.toLong,
      s"the model must beat the no-model slab scan: eps=$maxEps width=$slabW")
  }

  test("q426: JVM multiplied-units walk agrees; additive rollup differs") {
    val parts = Tables(spark, dir, "part")
      .select("p_partkey").collect().map(_.getLong(0))
    def explode(mul: Boolean): Map[Long, (Long, Long, Long)] = {
      val acc = scala.collection.mutable
        .Map.empty[Long, (Long, Long, Long)]
      parts.foreach { leaf =>
        var node = leaf; var units = 1L; var depth = 0L
        while (node >= 4) {
          if (mul) units *= node % 3 + 1 else units += 0
          node = node / 4; depth += 1
        }
        val (c, u, dmax) = acc.getOrElse(node, (0L, 0L, 0L))
        acc(node) = (c + 1, u + units, math.max(dmax, depth))
      }
      acc.toMap
    }
    val want = explode(mul = true)
    val got = q("q426_bom_explosion").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want.view.mapValues(v => (v._1, v._2, v._3)).toMap)
    // multiplicativity is load-bearing: unit-sum under additive
    // semantics (all units 1) differs from the explosion
    val additive = explode(mul = false)
    assert(want.exists { case (root, (_, u, _)) =>
      additive(root)._2 != u
    }, "multiplied units must differ from the additive count")
  }
}
