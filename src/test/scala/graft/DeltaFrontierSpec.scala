package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** Delta-frontier rounds (round-11 verdict item 1) must (a) change
  * nothing observable — outputs equal an independent JVM replay of the
  * full-frame rounds — and (b) actually bound per-round work by the
  * frontier's neighborhood: on a planted graph where a small component
  * converges late, the rounds after the bulk settles must carry ONLY
  * that component's nodes, never re-expand the settled mass.
  */
class DeltaFrontierSpec extends SparkSpec {
  import spark.implicits._

  /** Full-frame JVM peel replay (no early exit, no deltas) — the
    * independent oracle for the delta k-core census.
    */
  private def jvmPeel(
      edges: Seq[(Long, Long)], k: Int, rounds: Int): Seq[(Int, Long, Long)] = {
    var und = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    out += ((0, und.map(_._1).distinct.size.toLong, und.size.toLong / 2))
    for (r <- 1 to rounds) {
      val deg = und.groupBy(_._1).map { case (n, es) => (n, es.size) }
      val keep = deg.collect { case (n, d) if d >= k => n }.toSet
      und = und.filter(e => keep(e._1) && keep(e._2))
      out += ((r, und.map(_._1).distinct.size.toLong, und.size.toLong / 2))
    }
    out.toSeq
  }

  test("k-core: a slow-peeling path drags only its own ends; census equals JVM replay") {
    // K5 clique (stable at k=2 forever) + a 12-node path that peels two
    // ends per round — six live rounds, then the convergence probe.
    val clique = for {
      a <- 1L to 5L; b <- (a + 1) to 5L
    } yield (a, b)
    val path = (100L until 111L).map(i => (i, i + 1))
    val planted = (clique ++ path).toDF("u", "v").localCheckpoint(true)
    val (df, executed, frontiers) =
      Graphs.kcoreRoundsCounted(planted, k = 2, rounds = 8,
        edgeLimit = Long.MaxValue)
    val rows = df.collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === jvmPeel(clique ++ path, k = 2, rounds = 8))
    // 6 peel rounds (two path ends each) + 1 probe round; the clique
    // never re-enters the frontier — per-round work is the path's ends
    assert(executed === 7)
    assert(frontiers === Seq(2L, 2L, 2L, 2L, 2L, 2L, 0L),
      s"frontier must carry only the peeling component's ends: $frontiers")
  }

  test("deltaFixpoint BFS: after the bulk settles, only the slow chain stays in the frontier") {
    // star of 50 leaves on the source (all settle at round 1) + a
    // 6-node chain (one settles per round) — the late-converging
    // component whose neighborhood is the ONLY per-round mass
    val star = (1L to 50L).map(i => (0L, i))
    val chain = Seq((0L, 101L)) ++ (101L until 106L).map(i => (i, i + 1))
    val e = (star ++ chain).toDF("u", "v")
    val und = Graphs.doubled(e).localCheckpoint(true)
    val nodes = und.select(col("u").as("node")).distinct().localCheckpoint(true)
    val init = nodes.withColumn("dist",
      when(col("node") === 0L, 0L).otherwise(lit(null).cast("long")))
    val (dist, rounds, sizes) = Iterate.deltaFixpoint(
      init, init.filter(col("dist").isNotNull), maxRounds = 10) { (cur, frontier) =>
      val nxt = und
        .join(frontier.withColumnRenamed("node", "u"), "u")
        .groupBy(col("v").as("node"))
        .agg((min("dist") + 1).as("nd"))
      cur.join(nxt, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("dist"), col("nd")).as("dist"),
          (col("dist").isNull && col("nd").isNotNull).as("__delta_chg"))
    }
    assert(rounds === 7)
    assert(sizes === Seq(51L, 1L, 1L, 1L, 1L, 1L, 0L),
      s"settled bulk must never re-enter the frontier: $sizes")
    val hist = dist.groupBy("dist").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hist === Map(0L -> 1L, 1L -> 51L, 2L -> 1L, 3L -> 1L,
      4L -> 1L, 5L -> 1L, 6L -> 1L))
  }
}
