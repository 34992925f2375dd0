package graft

import org.apache.spark.sql.functions._

/** Invariants for the forty-fourth wave (q301-q304), re-derived
  * independently in the JVM: q301's medians/MAD by explicit sorting
  * (no percentile machinery), q302's pair supports from document word
  * sets, q303's LOCF by a literal carry-forward replay, q304's
  * observed metrics from collected rows.
  */
class Training44Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  // exact doubled median by sorting: 2*x[(n-1)/2] or x[k]+x[k+1]
  private def med2(xs: Seq[Long]): Long = {
    val s = xs.sorted
    if (s.size % 2 == 1) 2 * s(s.size / 2)
    else s(s.size / 2 - 1) + s(s.size / 2)
  }

  test("q301: median/MAD census re-derives by sorting") {
    val out = q("q301_mad_outliers").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val cents = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(out.keySet === cents.keySet)
    cents.foreach { case (f, xs) =>
      val m2 = med2(xs)
      val dev2 = xs.map(x => math.abs(2 * x - m2))
      val m4 = med2(dev2)
      val outliers = dev2.count(d => d * 2 * 10000 > m4 * 44478).toLong
      assert(out(f) === ((xs.size.toLong, m2, m4, outliers)), s"flag $f")
    }
  }

  test("q302: pair supports re-derive from document word sets") {
    val out = q("q302_cooccurrence_itemsets").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size === 15)
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val top = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(20).map(_._1).toSet
    val sets = docs.map { case (_, ws) => ws.toSet.intersect(top) }
    val df = top.map(w => w -> sets.count(_.contains(w))).toMap
    out.foreach { case ((w1, w2), (support, jacc)) =>
      val sup = sets.count(st => st.contains(w1) && st.contains(w2)).toLong
      assert(sup === support, s"pair ($w1,$w2) support")
      val expect = BigDecimal(sup.toDouble / (df(w1) + df(w2) - sup))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(jacc - expect) < 1e-9, s"pair ($w1,$w2) jaccard")
    }
  }

  test("q303: LOCF re-derives by literal carry-forward replay") {
    val out = q("q303_locf_impute").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.nonEmpty)
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("v6"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getString(3), r.getLong(4)))
      .groupBy(_._1)
    ev.foreach { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      var carry: Option[Long] = None
      var nulls = 0L; var filled = 0L; var sum = 0L
      ordered.foreach { case (_, _, _, typ, v) =>
        if (typ == "error") {
          nulls += 1
          carry.foreach { c => filled += 1; sum += c }
        } else carry = Some(v)
      }
      if (nulls > 0)
        assert(out(uid) === ((ordered.size.toLong, nulls, filled, sum)),
          s"user $uid LOCF")
      else assert(!out.contains(uid), s"user $uid should be filtered out")
    }
  }

  test("q304: observed metrics equal a direct recount") {
    val r = q("q304_observe_metrics").collect().head
    val li = Tables(spark, dir, "lineitem")
      .select(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("c"),
        col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      .collect()
    assert(r.getLong(0) === li.length.toLong)
    assert(r.getLong(1) === li.map(_.getLong(0)).sum)
    assert(r.getLong(2) === li.count(_.getString(1) == "R").toLong)
    assert(r.getLong(3) === li.map(_.getLong(2)).max)
  }
}
