package graft

import org.apache.spark.sql.functions._

/** Invariants for the ninety-eighth wave:
  *
  *  - q456: JVM replay of the full social-choice computation —
  *    preference profile, pairwise majority matrix, Borda scores —
  *    from independently-aggregated inputs; exactly one Borda winner;
  *    a Condorcet winner (when flagged) beats ALL other candidates
  *    pairwise.
  *  - q457: JVM replay of the Banzhaf index by brute-force coalition
  *    enumeration (independent of the SQL bitmask lattice); swing
  *    counts match, power shares sum to ~1e6, and every swing count
  *    is even-positioned sanity (a party with quota-majority weight
  *    would swing all 16 coalitions containing it).
  *  - q458: JVM replay of PERT by memoized recursion over the 4-ary
  *    pred DAG (structurally different from the fixed-round join
  *    relaxation): early starts, late finishes, slacks, and project
  *    duration all match; slack is non-negative; the returned 10 rows
  *    are the minimum-slack tasks and include a slack-0 critical task.
  */
class Training98Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q456: JVM social-choice replay; winner flags consistent") {
    val prefs = Tables(spark, dir, "orders").as("o")
      .join(Tables(spark, dir, "customer").as("c"),
        expr("c.c_custkey = o.o_custkey"))
      .groupBy(col("c.c_mktsegment").as("voter"),
        col("o.o_orderpriority").as("cand"))
      .agg(expr("CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) * 1000000 div count(*) AS BIGINT)").as("m"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val voters = prefs.map(_._1).distinct.sorted
    val cands = prefs.map(_._2).distinct.sorted
    // rank within voter: by avg desc, cand asc
    val rank: Map[(String, String), Int] = voters.flatMap { v =>
      prefs.filter(_._1 == v).sortBy { case (_, c, m) => (-m, c) }
        .zipWithIndex.map { case ((_, c, _), i) => ((v, c), i + 1) }
    }.toMap
    val nBeats = cands.map { x =>
      x -> cands.count(y => y != x &&
        2 * voters.count(v => rank((v, x)) < rank((v, y))) > voters.length)
    }.toMap
    val borda = cands.map { c =>
      c -> voters.map(v => 6L - rank((v, c))).sum
    }.toMap
    val bordaWinner = cands.minBy(c => (-borda(c), c))
    val got = q("q456_condorcet_borda").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === cands.toSeq)
    got.foreach { case (c, b, nb, isCond, isBorda) =>
      assert(b === borda(c), s"borda($c)")
      assert(nb === nBeats(c).toLong, s"n_beats($c)")
      assert(isCond === (if (nBeats(c) == cands.length - 1) 1 else 0))
      assert(isBorda === (if (c == bordaWinner) 1 else 0))
    }
    assert(got.map(_._5).sum === 1, "exactly one Borda winner")
    assert(got.map(_._4).sum <= 1, "at most one Condorcet winner")
  }

  test("q457: JVM Banzhaf replay by brute coalition enumeration") {
    val parties = Tables(spark, dir, "customer")
      .groupBy(col("c_mktsegment").as("seg")).agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val n = parties.length
    val tw = parties.map(_._2).sum
    val quota = tw / 2 + 1
    val swings = parties.zipWithIndex.map { case ((seg, w), bit) =>
      val cnt = (0 until (1 << n)).count { mask =>
        ((mask >> bit) & 1) == 1 && {
          val cw = parties.zipWithIndex
            .filter { case (_, b) => ((mask >> b) & 1) == 1 }
            .map(_._1._2).sum
          cw >= quota && cw - w < quota
        }
      }
      (seg, w, cnt.toLong)
    }
    val ts = swings.map(_._3).sum
    val got = q("q457_banzhaf_power").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.map(x => (x._1, x._2, x._4)).toSeq === swings.toSeq)
    got.foreach { case (seg, w, shPpm, sw, bzPpm) =>
      assert(shPpm === w * 1000000L / tw, s"weight share $seg")
      assert(bzPpm === sw * 1000000L / ts, s"banzhaf $seg")
    }
    // power shares sum to 1e6 up to integer-division dust
    val tot = got.map(_._5).sum
    assert(tot > 1000000L - n && tot <= 1000000L)
  }

  test("q458: JVM PERT replay by memoized recursion; slack law holds") {
    val parts = Tables(spark, dir, "part")
      .selectExpr("p_partkey", "CAST(p_size AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dur = parts.toMap
    val maxK = parts.map(_._1).max
    def preds(k: Long): Seq[Long] =
      Seq(k / 4).filter(_ >= 1) ++ Seq(k / 4 + 1).filter(p => p < k && p <= maxK)
    val succs: Map[Long, Seq[Long]] = parts.map(_._1)
      .flatMap(k => preds(k).map(p => p -> k)).groupBy(_._1)
      .map { case (p, xs) => p -> xs.map(_._2).toSeq }
    val esMemo = collection.mutable.Map[Long, Long]()
    def es(k: Long): Long = esMemo.getOrElseUpdate(k,
      preds(k).map(p => es(p) + dur(p)).foldLeft(0L)(math.max))
    val T = parts.map { case (k, d) => es(k) + d }.max
    val lfMemo = collection.mutable.Map[Long, Long]()
    def lf(k: Long): Long = lfMemo.getOrElseUpdate(k,
      succs.getOrElse(k, Nil).map(sc => lf(sc) - dur(sc)).foldLeft(T)(math.min))
    val all = parts.map { case (k, d) => (k, d, es(k), es(k) + d, lf(k), lf(k) - d - es(k)) }
    val want = all.sortBy { case (k, _, e, _, _, s) => (s, e, k) }.take(10)
      .map { case (k, d, e, ef, l, s) => (k, d, e, ef, l, s, T) }
    val got = q("q458_critical_path_pert").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === want.toSeq)
    all.foreach { case (k, _, _, _, _, s) => assert(s >= 0, s"slack($k) >= 0") }
    assert(got.head._6 === 0L, "a critical (slack-0) task exists")
    assert(got.forall(_._7 === T))
  }
}
