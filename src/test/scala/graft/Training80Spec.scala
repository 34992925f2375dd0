package graft

import org.apache.spark.sql.functions._

/** Invariants for the eightieth wave:
  *
  *  - q405: the chain head re-derives from a JVM fold AND is
  *    tamper-evident — flipping one historical row hash, dropping a
  *    batch, or swapping two batches all change the head;
  *  - q406: the nested scan's ReadSchema prunes to the single touched
  *    leaf (no sibling struct fields read);
  *  - q407: deciles are balanced, the assignment is ~50/50, and the
  *    uplift column re-derives from a JVM recount.
  */
class Training80Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q405: chain head re-derives in JVM and is tamper-evident") {
    val rows = Tables(spark, dir, "events")
      .selectExpr("to_date(ts)", "event_id", "unix_micros(ts)")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def digests(rs: Seq[(String, Long, Long)]): Seq[(String, Long)] =
      rs.groupBy(_._1).view.mapValues { g =>
        g.map { case (_, id, us) =>
          java.lang.Long.parseLong(md5hex(s"$id:$us").take(15), 16)
        }.foldLeft(0L)(_ ^ _)
      }.toSeq.sortBy(_._1)
    def chain(ds: Seq[(String, Long)]): String =
      ds.foldLeft("genesis") { case (acc, (_, d)) => md5hex(s"$acc:$d") }
    val base = digests(rows)
    val want = chain(base)
    val r = q("q405_audit_chain").collect().head
    assert(r.getString(0) === want)
    assert(r.getLong(1) === base.length.toLong)
    assert(r.getLong(2) === rows.length.toLong)
    // tamper-evidence: any historical modification moves the head
    val tampered = chain(base.updated(0, (base.head._1, base.head._2 ^ 1L)))
    val dropped = chain(base.drop(1))
    val swapped = chain(Seq(base(1), base(0)) ++ base.drop(2))
    assert((tampered != want) && (dropped != want) && (swapped != want))
  }

  test("q406: ReadSchema prunes to the single nested leaf") {
    val df = q("q406_nested_schema_pruning")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val read = "ReadSchema: ([^\\n]+)".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse("")
    assert(read.contains("total_cents"), s"leaf must be read: $read")
    assert(!read.contains("custkey") && !read.contains("status") &&
      !read.contains("priority"),
      s"sibling leaves must be pruned from the scan: $read")
    // and the census is the plain-orders truth
    val want = Tables(spark, dir, "orders").count()
    assert(df.collect().map(_.getLong(1)).sum === want)
  }

  test("q407: deciles balanced, split ~50/50, uplift re-derives") {
    val got = q("q407_uplift_deciles").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(got.length === 10)
    val nCust = Tables(spark, dir, "customer").count()
    assert(got.map(r => r._2 + r._3).sum === nCust)
    val nT = got.map(_._2).sum.toDouble
    assert(math.abs(nT / nCust - 0.5) < 0.15, "assignment must be ~50/50")
    // JVM recount of decile 1's uplift
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (k, b) => (-b, k) }
    val n = cust.length
    def decileOf(idx: Int): Int = {
      // ntile semantics: first (n % 10) tiles get one extra row
      val base = n / 10; val extra = n % 10
      val cut = (0 to 10).map(t => t * base + math.min(t, extra))
      cut.indexWhere(_ > idx) // 1-based tile
    }
    val spend = Tables(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var (ct, nt, cc, nc) = (0L, 0L, 0L, 0L)
    cust.zipWithIndex.foreach { case ((k, _), idx) =>
      if (decileOf(idx) == 1) {
        val treated =
          java.lang.Long.parseLong(md5hex(k.toString).take(15), 16) % 2 == 0
        val cents = spend.getOrElse(k, 0L)
        if (treated) { ct += cents; nt += 1 } else { cc += cents; nc += 1 }
      }
    }
    val wantUplift = (2 * ct + nt) / (2 * nt) - (2 * cc + nc) / (2 * nc)
    assert(got.find(_._1 == 1L).get._4 === wantUplift)
  }
}
