package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IqrOutlierFilterSpec extends SparkSpec {
  import spark.implicits._

  test("drops above Q3+1.5IQR only, per group, sequentially") {
    val df = Seq(
      ("g1", 1.0, 10.0), ("g1", 2.0, 10.0), ("g1", 3.0, 10.0), ("g1", 4.0, 10.0),
      ("g1", 100.0, 10.0), // outlier in c1
      ("g2", 5.0, 1.0), ("g2", 5.5, 2.0), ("g2", 6.0, 3.0), ("g2", 6.5, 500.0)
    ).toDF("g", "c1", "c2")
    val out = IqrOutlierFilter(df, Seq("g"), Seq("c1", "c2")).collect()
    assert(!out.exists(r => r.getDouble(1) === 100.0), "g1 c1 outlier removed")
    assert(!out.exists(r => r.getDouble(2) === 500.0), "g2 c2 outlier removed")
    assert(out.count(_.getString(0) == "g1") === 4)
    assert(out.count(_.getString(0) == "g2") === 3)
  }

  test("null group keys dropped; null values dropped only in filtered groups") {
    val df = Seq(
      (Some("g1"), Some(1.0)), (Some("g1"), Some(2.0)), (Some("g1"), Some(3.0)),
      (Some("g1"), Some(200.0)), (Some("g1"), None), // null value in filtered group → dropped
      (Some("gc"), Some(5.0)), (Some("gc"), Some(5.0)), (Some("gc"), None), // IQR==0 → all kept
      (None, Some(1.0)) // null key → dropped
    ).toDF("g", "c")
    val out = IqrOutlierFilter(df, Seq("g"), Seq("c"))
    assert(out.filter(col("g").isNull).count() === 0)
    assert(out.filter(col("g") === "g1").count() === 3)
    assert(out.filter(col("g") === "gc").count() === 3, "skipped group keeps null-value rows")
  }
}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._
  private def ts(s: String) = Timestamp.valueOf(s)

  test("most recent right row at or before left time, per key; left outer") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u2", ts("2024-01-01 10:30:00")),
      (4L, "u3", ts("2024-01-01 09:00:00")) // no right rows for u3
    ).toDF("id", "user", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 100L),
      ("u1", ts("2024-01-01 11:00:00"), 101L),
      ("u1", ts("2024-01-01 12:00:00"), 102L), // tie with left id=2 → matched (>= semantics)
      ("u2", ts("2024-01-01 10:30:01"), 200L)  // just after left id=3 → no match
    ).toDF("user", "rt", "rid")
    val out = AsOfJoin(left, right, Seq("user"), "t", "rt", Seq("rid"), "rid")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(1L) === Some(100L))
    assert(out(2L) === Some(102L), "equal timestamps match (>= convention)")
    assert(out(3L) === None)
    assert(out(4L) === None)
  }
}

class TextOpsSpec extends SparkSpec {

  test("ngram shingles: count and content") {
    val df = spark.sql("SELECT 'a b c d' AS text")
    val got = df.selectExpr(s"${TextOps.ngramsSpark(3)} AS ng")
      .head.getSeq[String](0)
    assert(got.toSet === Set("a b c", "b c d"))
  }

  test("jaccard on distinct arrays") {
    val df = spark.sql("SELECT array('x','y','z') AS a, array('y','z','w') AS b")
    val j = df.selectExpr(s"${TextOps.jaccardSpark("a", "b")} AS j").head.getDouble(0)
    assert(math.abs(j - 2.0 / 4.0) < 1e-12)
  }

  test("simhash identical docs equal, disjoint docs differ") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |('spark makes big data small again and again'),
        |('spark makes big data small again and again'),
        |('entirely different words about wafers defects lithography steps')
        |AS t(text)""".stripMargin)
    val hs = df.selectExpr(s"${TextOps.wordHashesSpark()} AS hs")
      .selectExpr(s"${TextOps.simhashSpark("hs", 16)} AS sh")
      .collect().map(_.getLong(0))
    assert(hs(0) === hs(1))
    assert(hs(0) !== hs(2))
  }
}

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed keys") {
    // hot key: 10k rows of "hot", a few of others
    val left = ((1 to 10000).map(i => ("hot", i)) ++ Seq(("a", 1), ("b", 2)))
      .toDF("k", "v")
    val right = Seq(("hot", 100), ("a", 200), ("c", 300)).toDF("k", "w")
    val plain = left.join(right, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SaltedJoin(left, right, Seq("k"), saltFactor = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
    assert(salted.exists(_._1 == "hot"))
  }
}
