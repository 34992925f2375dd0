package graft

import java.time.Instant

import org.apache.spark.sql.functions._

/** Invariants for waves 46-47 (q309-q316): window/session laws replayed
  * from raw events, URL/bitmap/XML/pipe rollups recounted in the JVM,
  * sketch gates re-checked independently.
  */
class Training46Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  private def eventsJvm() = Tables(spark, dir, "events")
    .select(col("user_id"), col("ts").cast("long").as("sec"))
    .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("q309: 6-hour buckets re-derive from epoch arithmetic") {
    val out = q("q309_batch_time_window").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val expect = eventsJvm()
      .groupBy { case (_, sec) => sec / 21600 * 21600 }
      .map { case (b, g) =>
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
          .withZone(java.time.ZoneOffset.UTC)
          .format(Instant.ofEpochSecond(b)) -> g.length.toLong
      }
    assert(out === expect)
  }

  test("q310: session laws hold against a raw-event replay") {
    val out = q("q310_batch_session_window").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.nonEmpty)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    val byUser = eventsJvm().groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toVector).toMap
    val sessionsByUser = out.groupBy(_._1)
    // independent sessionization replay: split at gaps >= 1800s
    byUser.foreach { case (uid, ts) =>
      val sessions = ts.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
        if (acc.nonEmpty && t - acc.last.last < 1800) acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }
      val got = sessionsByUser(uid).sortBy(_._2)
      assert(got.length === sessions.length, s"user $uid session count")
      got.zip(sessions).foreach { case ((_, s0, s1, n), sess) =>
        assert(s0 === fmt.format(Instant.ofEpochSecond(sess.head)), s"user $uid start")
        assert(s1 === fmt.format(Instant.ofEpochSecond(sess.last + 1800)), s"user $uid end")
        assert(n === sess.length.toLong, s"user $uid n_events")
      }
    }
  }

  test("q311: URL rollup recounts from the planted fields") {
    val out = q("q311_url_functions").collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.groupBy { case (id, src) => (s"ex${id % 5}.com", src) }
      .view.mapValues(g => (g.length.toLong, g.map(_._1).distinct.length.toLong)).toMap
    assert(out === expect)
  }

  test("q312: bitmap distinct equals a plain distinct recount") {
    val out = q("q312_bitmap_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Tables(spark, dir, "orders")
      .select("o_orderpriority", "o_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    assert(out === expect)
  }

  test("q313: exact top-5 recounts and sits inside the sketch top-10") {
    val out = q("q313_approx_top_k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === 5)
    assert(out.forall(_._3), "containment gate must hold")
    val counts = Tables(spark, dir, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val top5 = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(5)
    assert(out.map(r => (r._1, r._2)).toSeq === top5)
  }

  test("q314: gates hold and exact distincts recount") {
    val out = q("q314_hll_sketch_union").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.values.forall(_._2), "every HLL gate must hold")
    val ev = Tables(spark, dir, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (t, g) =>
      assert(out(t)._1 === g.map(_._2).distinct.length.toLong, s"type $t")
    }
    assert(out("__union__")._1 === ev.map(_._2).distinct.length.toLong)
  }

  test("q315: XML round-trip rollup equals a direct column rollup") {
    val out = q("q315_from_xml").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables(spark, dir, "documents")
      .select("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).length.toLong))
    val expect = docs.groupBy(_._1).view.mapValues(g =>
      (g.length.toLong, g.map(_._3).sum, g.map(_._2).max)).toMap
    assert(out === expect)
  }

  test("q316: pipe syntax equals the DataFrame form") {
    val out = q("q316_sql_pipe_syntax").collect().map(_.toSeq).toSeq
    val expect = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") < 25)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")).as("cents"))
      .orderBy("l_returnflag")
      .collect().map(_.toSeq).toSeq
    assert(out.nonEmpty && out === expect)
  }
}
