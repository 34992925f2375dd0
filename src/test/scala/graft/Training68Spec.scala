package graft

import org.apache.spark.sql.functions._

/** Invariants for the sixty-eighth wave:
  *
  *  - q371: the full bootstrap (draws, resample means, CI cut)
  *    re-derives in the JVM from [[JvmRef.hash60]]; the CI brackets
  *    the point estimate and is non-degenerate;
  *  - q372: the descent really is local (≪ all leaves checked), the
  *    suspect set covers every tampered row, and the censuses
  *    re-derive from a JVM digest tree;
  *  - q373: layers re-derive by JVM longest-path over the edges that
  *    hold, and every FK edge the schema implies holds on the data.
  */
class Training68Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q371: bootstrap draws, means and CI re-derive in the JVM") {
    val xs = Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def pois(u: Double): Long =
      if (u < 0.367879) 0 else if (u < 0.735759) 1 else if (u < 0.919699) 2
      else if (u < 0.981012) 3 else if (u < 0.996340) 4 else 5
    val means = (0 until 32).map { b =>
      var wx = BigInt(0); var wn = BigInt(0)
      xs.foreach { case (k, x) =>
        val w = pois((JvmRef.hash60(s"$k:$b") % 1000000) / 1000000.0)
        wx += BigInt(w) * x; wn += w
      }
      (b, ((2 * wx + wn) / (2 * wn)).toLong)
    }
    val sortedAsc = means.sortBy { case (b, m) => (m, b) }
    val sortedDesc = means.sortBy { case (b, m) => (-m, -b) }
    val (wantLo, wantHi) = (sortedAsc(1)._2 max sortedAsc(0)._2,
      sortedDesc(1)._2 min sortedDesc(0)._2)
    val r = q("q371_poisson_bootstrap_ci").collect().head
    assert(r.getLong(0) === xs.length.toLong)
    assert(r.getLong(2) === wantLo && r.getLong(3) === wantHi)
    assert(r.getLong(2) < r.getLong(1) && r.getLong(1) < r.getLong(3),
      "CI must bracket the point estimate")
  }

  test("q372: descent is local, suspects cover the damage, JVM tree agrees") {
    val rows = Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def leafOf(k: Long) = (k / 64) % 256
    def digest(v: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
      v.groupBy(r => leafOf(r._1)).view.mapValues { g =>
        (g.map { case (k, c) => JvmRef.hash60(s"$k:$c") }
          .foldLeft(0L)(_ ^ _), g.size.toLong)
      }.toMap
    val va = digest(rows)
    val vb = digest(rows.map { case (k, c) =>
      (k, if (k >= 1000 && k < 1100) c + 1 else c)
    })
    val badLeaves = (va.keySet ++ vb.keySet)
      .filter(l => va.get(l).map(_._1) != vb.get(l).map(_._1))
    val badGroups = badLeaves.map(_ / 16)
    val checked = (va.keySet ++ vb.keySet).count(l => badGroups(l / 16))
    val suspects = badLeaves.toSeq.map(l => vb(l)._2).sum
    val r = q("q372_merkle_antientropy").collect().head
    assert(r.getLong(0) === badGroups.size.toLong)
    assert(r.getLong(1) === checked.toLong)
    assert(r.getLong(2) === badLeaves.size.toLong)
    assert(r.getLong(3) === suspects)
    // locality: the descent must touch a small fraction of the tree
    assert(r.getLong(1) <= 64, s"descent not local: ${r.getLong(1)} leaves")
    // coverage: every damaged row lives in a suspect leaf
    val damaged = rows.filter(r2 => r2._1 >= 1000 && r2._1 < 1100)
    assert(damaged.nonEmpty && damaged.forall(r2 => badLeaves(leafOf(r2._1))))
  }

  test("q373: layers re-derive by JVM longest path; schema FKs hold") {
    val got = q("q373_fk_topology_layers").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val edges = Seq("lineitem" -> "orders", "lineitem" -> "part",
      "orders" -> "customer", "customer" -> "nation",
      "supplier" -> "nation", "nation" -> "region")
    def layer(t: String): Int = {
      val ps = edges.filter(_._1 == t).map(_._2)
      if (ps.isEmpty) 1 else 1 + ps.map(layer).max
    }
    got.foreach { case (t, (l, np)) =>
      assert(l === layer(t), t)
      assert(np === edges.count(_._1 == t).toLong, t)
    }
    assert(got("lineitem")._1 === 5 && got("region")._1 === 1)
  }
}
