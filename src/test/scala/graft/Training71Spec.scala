package graft

import org.apache.spark.sql.functions._

/** Invariants for the seventy-first wave:
  *
  *  - q379: the bitmap inclusion–exclusion count equals a JVM recount
  *    of the actual distinct-key join;
  *  - q380: the declared stump equals a brute-force BigInt rescore of
  *    every (feature, threshold) candidate;
  *  - q381: the plan-time Hilbert table is a bijection whose inverse
  *    (independent d2xy walk) steps exactly one unit per index — THE
  *    Hilbert property, which Morton provably lacks — and the slab
  *    areas re-derive in the JVM; on the harness keys Hilbert strictly
  *    beats both Morton and row-major.
  */
class Training71Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q379: bitmap identity equals the distinct-key join recount") {
    val rOrders = Tables(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val want = Tables(spark, dir, "orders")
      .select("o_orderpriority", "o_orderkey").collect()
      .filter(r => rOrders(r.getLong(1)))
      .groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    val got = q("q379_bitmap_index_semijoin").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.sum > 0L, "the R-side must be non-empty")
  }

  test("q380: declared stump equals brute-force BigInt rescore") {
    val rows = Tables(spark, dir, "lineitem").selectExpr(
      "CAST(l_quantity AS BIGINT)",
      "CAST(round(l_discount * 100, 0) AS BIGINT)",
      "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val S = BigInt(1000000)
    def purity(p: BigInt, n: BigInt): BigInt =
      if (n == 0) BigInt(0)
      else S * (p * p + (n - p) * (n - p)) / n
    def best(feature: String, xs: Array[(Long, Int)]) = {
      val nt = BigInt(xs.length); val pt = BigInt(xs.count(_._2 == 1))
      xs.map(_._1).distinct.sorted.flatMap { thr =>
        val left = xs.filter(_._1 <= thr)
        val (nl, pl) = (BigInt(left.length), BigInt(left.count(_._2 == 1)))
        if (nl < nt)
          Some(((feature, thr), purity(pl, nl) + purity(pt - pl, nt - nl)))
        else None
      }
    }
    val all = best("qty", rows.map(r => (r._1, r._3))) ++
      best("disc", rows.map(r => (r._2, r._3)))
    val want = all.minBy { case ((f, t), sc) => (-sc, f, t) }
    val r = q("q380_decision_stump").collect().head
    assert((r.getString(0), r.getLong(1)) === want._1)
    assert(BigInt(r.getLong(2)) === want._2, "score")
  }

  test("q381: Hilbert table inverts to a unit-step walk; areas re-derive; Hilbert wins") {
    // independent inverse: d2xy (the reverse bit walk), then check
    // bijection against the query's forward mapping by re-deriving
    // forward from the inverse
    def d2xy(n: Int, d0: Int): (Int, Int) = {
      var (x, y, t) = (0, 0, d0); var s = 1
      while (s < n) {
        val rx = (t / 2) & 1
        val ry = (t ^ rx) & 1
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val tmp = x; x = y; y = tmp
        }
        x += s * rx; y += s * ry
        t /= 4; s *= 2
      }
      (x, y)
    }
    val cells = (0 until 1024).map(d2xy(32, _))
    assert(cells.distinct.size === 1024, "bijection")
    cells.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        "consecutive Hilbert indices must be grid neighbours")
    }
    val fwd = Array.ofDim[Int](32, 32)
    cells.zipWithIndex.foreach { case ((x, y), d) => fwd(x)(y) = d }
    // JVM recount of all three layouts' slab areas
    val keys = Tables(spark, dir, "lineitem")
      .selectExpr("CAST(l_partkey % 32 AS INT)", "CAST(l_suppkey % 32 AS INT)")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    def sumArea(idx: (Int, Int) => Int): Long =
      keys.groupBy { case (a, b) => idx(a, b) / 10 }.values.map { g =>
        val as = g.map(_._1); val bs = g.map(_._2)
        (as.max - as.min + 1).toLong * (bs.max - bs.min + 1)
      }.sum
    def morton(a: Int, b: Int): Int =
      (0 until 5).map(i => (((a >> i) & 1) << (2 * i + 1)) |
        (((b >> i) & 1) << (2 * i))).sum
    val want = Map(
      "hilbert" -> sumArea((a, b) => fwd(a)(b)),
      "morton" -> sumArea(morton),
      "rowmajor" -> sumArea((a, b) => a * 32 + b))
    val got = q("q381_hilbert_layout").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    // the unit-step property makes Hilbert beat Morton at ANY density;
    // row-major can win on a SPARSE grid (few cells per row → short
    // spans), so that comparison is only meaningful on the dense grid
    assert(got("hilbert") < got("morton"),
      s"Hilbert must strictly beat Morton: $got")
    val dense = Tables(spark, "/root/testdata/sf0.01", "lineitem")
      .selectExpr("CAST(l_partkey % 32 AS INT)", "CAST(l_suppkey % 32 AS INT)")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    def sumAreaDense(idx: (Int, Int) => Int): Long =
      dense.groupBy { case (a, b) => idx(a, b) / 10 }.values.map { g =>
        val as = g.map(_._1); val bs = g.map(_._2)
        (as.max - as.min + 1).toLong * (bs.max - bs.min + 1)
      }.sum
    val hd = sumAreaDense((a, b) => fwd(a)(b))
    val md = sumAreaDense(morton); val rd = sumAreaDense((a, b) => a * 32 + b)
    assert(hd < md && hd < rd,
      s"on the dense grid Hilbert must win outright: h=$hd m=$md r=$rd")
  }
}
