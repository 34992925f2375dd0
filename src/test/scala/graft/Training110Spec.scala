package graft

/** Invariants for the hundred-tenth wave:
  *
  *  - q489: the exact witnesses re-derive from a JVM recount and both
  *    contract gates hold; the estimator algebra (est within
  *    ⌈partial/2⌉+1 of exact) is re-proved in the spec for ARBITRARY
  *    boundary sets — the argument the sketch twin's correctness rests
  *    on is boundary-agnostic, which is why a merge-order-dependent
  *    sketch can sit under a hash oracle at all.
  */
class Training110Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q489: witnesses re-derive; contracts hold; bound argument is boundary-agnostic") {
    val vs = Tables(spark, dir, "lineitem")
      .selectExpr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
      .collect().map(_.getLong(0))
    val exact = vs.count(v => v >= 2000000L && v <= 6000000L).toLong
    val r = q("q489_histogram_answering_sketch").collect()
    assert(r.length === 1)
    assert(r.head.getLong(0) === exact, "exact_n witness")
    assert(r.head.getLong(1) === vs.length.toLong, "n_rows witness")
    assert(r.head.getBoolean(2), "bound_ok contract")
    assert(r.head.getBoolean(3), "slabs_ok contract")

    // the error-bound argument, independent of WHERE the boundaries
    // come from: pick several adversarial boundary sets (including
    // badly skewed ones no sane sketch would emit) and check
    // |est - exact| <= partial/2 + 1 on several windows
    val sorted = vs.sorted
    val boundarySets = Seq(
      (1 to 63).map(i => sorted((i * (vs.length - 1)) / 64)), // equi-depth
      (1 to 63).map(i => sorted.head + i), // all boundaries at the low end
      (1 to 63).map(i => sorted.last - 64 + i)) // all at the high end
    val windows = Seq((2000000L, 6000000L), (0L, 3000000L),
      (5000000L, 11000000L), (sorted.head, sorted.last))
    for (bs <- boundarySets; (lo, hi) <- windows) {
      val slabOf = (v: Long) => bs.count(v > _)
      val census = vs.groupBy(slabOf).view.mapValues(_.length.toLong).toMap
      val sl = bs.count(lo > _); val sh = bs.count(hi > _)
      val inner = census.collect { case (s0, c) if s0 > sl && s0 < sh => c }.sum
      val partial = census.collect { case (s0, c) if s0 == sl || s0 == sh => c }.sum
      val est = inner + (partial + 1) / 2
      val ex = vs.count(v => v >= lo && v <= hi).toLong
      assert(math.abs(est - ex) <= partial / 2 + 1,
        s"bound must hold for any boundaries: window=($lo,$hi) est=$est exact=$ex partial=$partial")
    }
  }
}
