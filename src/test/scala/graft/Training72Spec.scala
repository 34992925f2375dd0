package graft

import org.apache.spark.sql.functions._

/** Invariants for the seventy-second wave:
  *
  *  - q382: pivot distances re-derive by JVM BFS over the collected
  *    edge list (independent traversal), and the closeness ordering
  *    matches;
  *  - q383: MG candidate sets from ANY partitioning contain every true
  *    heavy hitter and respect est ≤ exact ≤ est + n/k (JVM replay of
  *    the per-partition algorithm + merge on an adversarial split);
  *  - q384: under the declared confs the final adaptive plan actually
  *    splits the skewed partition (isSkew=true), and the census
  *    matches a plain-join recount.
  */
class Training72Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q382: pivot BFS re-derives in the JVM; ordering matches") {
    val edges = graft.operators.Graphs.coPurchaseEdges(
      Tables(spark, dir, "lineitem"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sources = nodes.toSeq.sortBy(n => (md5hex(n.toString), n)).take(16)
    assert(sources.nonEmpty, "pivot set must be non-empty")
    def bfs(src: Long): Map[Long, Int] = {
      var dist = Map(src -> 0); var frontier = Set(src)
      for (step <- 1 to 4) {
        frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
        dist ++= frontier.iterator.map(_ -> step)
      }
      dist
    }
    val per = sources.map(bfs)
    val score = nodes.toSeq.flatMap { v =>
      val ds = per.flatMap(_.get(v)).filter(_ > 0)
      if (ds.isEmpty) None
      else Some((v, ds.size.toLong, ds.map(_.toLong).sum))
    }.map { case (v, k, sd) => (v, k, sd, 1000000L * k / sd) }
    val want = score.sortBy { case (v, _, _, c) => (-c, v) }.take(10)
      .map { case (v, k, sd, c) => (v, k, sd, c) }
    val got = q("q382_closeness_sampled").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
  }

  test("q383: JVM MG replay on an adversarial split keeps the guarantee") {
    val keys = Tables(spark, dir, "lineitem")
      .selectExpr("""CASE WHEN l_orderkey % 4 != 0
          THEN concat('hot', CAST(l_orderkey % 3 AS STRING))
          ELSE concat('cold', CAST(l_orderkey % 997 AS STRING)) END""")
      .collect().map(_.getString(0))
    val k = 8
    def mg(stream: Seq[String]): Map[String, Long] = {
      val c = scala.collection.mutable.Map.empty[String, Long]
      stream.foreach { key =>
        if (c.contains(key)) c(key) += 1
        else if (c.size < k) c(key) = 1
        else c.keys.toSeq.foreach { x =>
          c(x) -= 1; if (c(x) == 0) c.remove(x)
        }
      }
      c.toMap
    }
    val exact = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = keys.length.toLong
    val trueHH = exact.filter(_._2 > n / k).keySet
    // adversarial split: sorted halves (worst case for eviction churn)
    val sortedKeys = keys.sorted
    val (h1, h2) = sortedKeys.splitAt(sortedKeys.length / 2)
    val merged = (mg(h1.toSeq).toSeq ++ mg(h2.toSeq).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    trueHH.foreach { key =>
      assert(merged.contains(key), s"true HH $key lost by MG merge")
      val est = merged(key)
      assert(est <= exact(key) && exact(key) - est <= n / k,
        s"bound violated for $key: est=$est exact=${exact(key)}")
    }
    val got = q("q383_misra_gries_heavy_hitters").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3)))
    assert(got.map(_._1).toSet === trueHH)
    got.foreach { case (key, cnt, inCand, boundOk) =>
      assert(cnt === exact(key)); assert(inCand && boundOk, key)
    }
  }

  test("q384: the final adaptive plan splits the skewed partition") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(key => key -> conf.getOption(key))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "100KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // sf0.01 so the hot partition comfortably exceeds 100KB
      val df = graft.queries.Training72.skewJoin(spark,
        "/root/testdata/sf0.01")
      df.collect() // drive AQE to the final plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
        s"adaptive plan must mark the skew split:\n${plan.take(2000)}")
    } finally saved.foreach { case (key, v) =>
      v.fold(conf.unset(key))(conf.set(key, _))
    }
    // census parity with a plain (broadcast-allowed, no-AQE-tuning) join
    val got = q("q384_aqe_skew_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = graft.queries.Training72.skewJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
  }
}
