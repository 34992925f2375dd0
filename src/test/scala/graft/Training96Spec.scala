package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninety-sixth wave:
  *
  *  - q450: JVM replay of the supporting-line extreme-point set; every
  *    non-extreme point is strictly inside some supporting line's
  *    left half-plane (the witness), and all points lie within the
  *    extreme bounding box;
  *  - q451: JVM replay of the Allen census; the 13 relations are
  *    exhaustive (counts sum to every same-customer pair) and
  *    direction-consistent (swapping a pair maps rel ↔ rel_inv);
  *  - q452: JVM replay of the full PID walk; saturation censuses
  *    bound the replica range.
  */
class Training96Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q450: JVM extreme-point replay; non-extremes have a separating witness") {
    val pts = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"),
        expr("c.c_custkey = o.o_custkey"))
      .groupBy(expr("c.c_nationkey"), expr("c.c_mktsegment"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(o.o_totalprice, 0) AS BIGINT)")).as("y"))
      .select("x", "y").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def cross(a: (Long, Long), b: (Long, Long), r: (Long, Long)): Long =
      (b._1 - a._1) * (r._2 - a._2) - (b._2 - a._2) * (r._1 - a._1)
    val extremes = (for {
      a <- pts; b <- pts if a != b
      if pts.forall(r => cross(a, b, r) <= 0)
    } yield Seq(a, b)).flatten.distinct.sorted
    val got = q("q450_convex_extremes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(x => (x._1, x._2)).toSeq === extremes)
    assert(got.head._3 === extremes.length.toLong)
    assert(got.head._4 === pts.length.toLong)
    // every point is inside the extreme bounding box (necessary cond.)
    val (xs, ys) = (extremes.map(_._1), extremes.map(_._2))
    pts.foreach { p =>
      assert(p._1 >= xs.min && p._1 <= xs.max && p._2 >= ys.min && p._2 <= ys.max)
    }
    // interior witness: each non-extreme sits strictly left of SOME
    // directed extreme pair (so it can never be an edge endpoint)
    val exSet = extremes.toSet
    pts.filterNot(exSet).foreach { p =>
      assert(extremes.exists(a => extremes.exists(b =>
        a != b && cross(a, b, p) > 0)), s"$p has no separating witness")
    }
  }

  test("q451: JVM Allen replay; relations exhaustive and involutive") {
    val iv = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "lineitem").as("l"),
        expr("l.l_orderkey = o.o_orderkey"))
      .groupBy("o.o_custkey", "o.o_orderkey")
      .agg(expr("CAST(max(o.o_orderdate) AS DATE)").as("s"),
        expr("CAST(max(l.l_shipdate) AS DATE)").as("e"))
      .filter(col("e") >= col("s"))
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(s AS STRING)", "CAST(e AS STRING)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    def rel(a: (String, String), b: (String, String)): String = {
      val (as_, ae, bs, be) = (a._1, a._2, b._1, b._2)
      if (ae < bs) "before"
      else if (be < as_) "before_inv"
      else if (ae == bs && as_ < bs) "meets"
      else if (be == as_ && bs < as_) "meets_inv"
      else if (as_ == bs && ae == be) "equals"
      else if (as_ == bs && ae < be) "starts"
      else if (as_ == bs && ae > be) "starts_inv"
      else if (ae == be && as_ > bs) "finishes"
      else if (ae == be && as_ < bs) "finishes_inv"
      else if (as_ > bs && ae < be) "during"
      else if (bs > as_ && be < ae) "during_inv"
      else if (as_ < bs && ae < be) "overlaps"
      else "overlaps_inv"
    }
    val pairs = iv.groupBy(_._1).values.flatMap { xs =>
      val s = xs.sortBy(_._2)
      for (i <- s.indices; j <- (i + 1) until s.length)
        yield ((s(i)._3, s(i)._4), (s(j)._3, s(j)._4))
    }.toSeq
    val want = pairs.groupBy { case (a, b) => rel(a, b) }
      .map { case (k, xs) => (k, xs.size.toLong) }.toSeq.sortBy(_._1)
    val got = q("q451_allen_interval_census").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === want)
    assert(got.map(_._2).sum === pairs.size.toLong, "census must be exhaustive")
    // involution: swapping the pair maps each relation to its inverse
    def inv(r: String): String =
      if (r == "equals") r
      else if (r.endsWith("_inv")) r.dropRight(4) else r + "_inv"
    pairs.take(500).foreach { case (a, b) =>
      assert(rel(b, a) === inv(rel(a, b)))
    }
  }

  test("q452: JVM PID walk replay") {
    val load = Tables(spark, dir, "events")
      .groupBy(expr("to_date(ts)").as("day")).agg(count(lit(1)).as("v"))
      .selectExpr("CAST(day AS STRING)", "v").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val target = load.map(_._2).sum / load.length
    var ie = 0L; var prev = Option.empty[Long]
    val recs = load.map { case (_, v) =>
      val e = v - target
      ie += e
      val de = e - prev.getOrElse(e)
      prev = Some(e)
      val u = math.floorDiv(500000 * e + 100000 * ie + 200000 * de, 1000000)
      val rep = math.min(64L, math.max(1L, 1 + math.floorDiv(u * 64, math.max(target, 1))))
      (e, rep)
    }
    val r = q("q452_pid_autoscaler").collect().head
    assert(r.getLong(0) === load.length.toLong)
    assert(r.getLong(1) === recs.map(_._2).max)
    assert(r.getLong(2) === recs.map(_._2).min)
    assert(r.getLong(3) === recs.count(_._2 == 64L).toLong)
    assert(r.getLong(4) === recs.count(_._2 == 1L).toLong)
    assert(r.getLong(5) === recs.map(x => math.abs(x._1)).sum)
  }
}
