package graft

import org.apache.spark.sql.functions._

/** Invariants for the forty-fifth wave (q305-q308), re-derived
  * independently: q305's map pipeline as plain JVM word counts, q306's
  * chunk geometry replayed + coverage laws, q307's distances by an
  * actual queue BFS (not min-agg rounds), q308's selections by interval
  * arithmetic + the certainty-selection law for heavy weights.
  */
class Training45Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q305: map pipeline equals plain word-count arithmetic") {
    val out = q("q305_map_type_ops").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    val docs = Tables(spark, dir, "documents")
      .filter(col("doc_id") < 50).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val expect = docs.flatMap { case (id, ws) =>
      ws.groupBy(identity).collect {
        case (w, g) if g.length >= 2 => (id, w) -> g.length.toLong * 2
      }
    }.toMap
    assert(out === expect)
  }

  test("q306: chunk geometry replays and covers every token exactly once per window") {
    val rows = q("q306_rag_chunking").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getInt(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    byDoc.foreach { case (id, chunks) =>
      val toks = docs(id)
      val sorted = chunks.sortBy(_._4)
      // starts are 0, 30, 60, ... < n and the tail chunk ends at n
      assert(sorted.map(_._2).toSeq === (0L until toks.length.toLong by 30L).toSeq,
        s"doc $id starts")
      sorted.foreach { case (_, start, len, idx, first, last) =>
        assert(len === math.min(40, toks.length - start.toInt), s"doc $id len")
        assert(idx === start / 30, s"doc $id idx")
        assert(first === toks(start.toInt), s"doc $id first")
        assert(last === toks(start.toInt + len - 1), s"doc $id last")
      }
      assert(sorted.last._2 + sorted.last._3 === toks.length.toLong,
        s"doc $id tail must reach the end")
    }
  }

  test("q307: hop histogram equals a queue BFS") {
    val out = q("q307_bfs_distance").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val op = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = op.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    // queue BFS (different machinery than the query's min-agg rounds)
    var dist = nodes.filter(_ % 1000 == 0).map(_ -> 0).toMap
    var frontier = dist.keySet
    for (r <- 1 to 4) {
      val nxt = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(dist.contains)
      dist ++= nxt.map(_ -> r)
      frontier = nxt
    }
    val expect = nodes.groupBy(n => dist.getOrElse(n, -1)).view
      .mapValues(_.size.toLong).toMap
    assert(out === expect)
    assert(out.getOrElse(0, 0L) > 0, "sources must exist")
    assert(out.keys.exists(_ > 0), "expansion must fire")
  }

  test("q308: every selection interval contains a boundary; heavy parts always selected") {
    val rows = q("q308_pps_systematic_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val rev = Tables(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val total = rev.map(_._2).sum
    val step = math.max(total / 64, 1L)
    // independent replay: select parts whose cum interval crosses a step
    var cum = 0L
    val expect = rev.flatMap { case (pk, w) =>
      cum += w
      if (cum / step > (cum - w) / step) Some((pk, w, cum, cum / step)) else None
    }
    assert(rows.toSeq === expect.toSeq)
    // certainty selection: any weight >= step MUST be sampled (the PPS law)
    val sampled = rows.map(_._1).toSet
    rev.filter(_._2 >= step).foreach { case (pk, _) =>
      assert(sampled.contains(pk), s"heavy part $pk must be a certainty selection")
    }
  }
}
