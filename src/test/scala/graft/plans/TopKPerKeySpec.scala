package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {

  private def windowTopK(k: Int) = {
    import spark.implicits._
    Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 20.0),
      ("b", 5L, 5.0), ("b", 6L, 1.0),
      ("c", 7L, 9.0),
    ).toDF("k", "id", "v")
  }

  test("matches the window row_number rewrite on a total order") {
    val df = windowTopK(2)
    val got = TopKPerKey(df, Seq("k"), Seq("v" -> false, "id" -> true), 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)))
      .filter(col("rn") <= 2).drop("rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    assert(got == Set(
      ("a", 2L, 30.0), ("a", 3L, 30.0),
      ("b", 5L, 5.0), ("b", 6L, 1.0), // b has only 2 rows: k=2 keeps both
      ("c", 7L, 9.0)))
  }

  test("k >= group size returns whole groups; exec appears in the plan with one exchange") {
    val df = windowTopK(2).repartition(3)
    val topped = TopKPerKey(df, Seq("k"), Seq("id" -> true), 10)
    assert(topped.count() == 7)
    val plan = topped.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("pre-clustered child elides the exchange (the bucketed-table fast path)") {
    val df = windowTopK(2).repartition(col("k"))
    val topped = TopKPerKey(df, Seq("k"), Seq("id" -> true), 1)
    val plan = topped.queryExecution.executedPlan.toString
    // the only hashpartitioning exchange is the explicit repartition —
    // EnsureRequirements recognizes the child distribution and adds none
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(topped.count() == 3)
  }

  test("heap keeps the BEST k, not the first k seen (order-independence)") {
    import spark.implicits._
    // worst rows first within a single partition: admission must evict
    val df = (1L to 100L).map(i => ("g", i)).toDF("k", "id").coalesce(1)
    val got = TopKPerKey(df, Seq("k"), Seq("id" -> false), 3)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(100L, 99L, 98L))
  }

  test("random frames: exec equals the window rewrite for k in {1, 3}") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 3; k <- Seq(1, 3)) {
      // duplicate-heavy keys and values; id column makes the order total
      val rows = (1 to 300).map { i =>
        (s"k${rng.nextInt(7)}", rng.nextInt(5).toDouble, i.toLong)
      }
      val df = rows.toDF("k", "v", "id").repartition(5)
      val got = TopKPerKey(df, Seq("k"), Seq("v" -> false, "id" -> true), k)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      val want = df.withColumn("rn", row_number().over(
          Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      assert(got == want, s"trial=$trial k=$k")
    }
  }

  test("column names resolve case-insensitively, like the DataFrame API") {
    val got = TopKPerKey(windowTopK(2), Seq("K"), Seq("V" -> false, "ID" -> true), 1)
    assert(got.count() == 3)
    val err = intercept[IllegalArgumentException] {
      TopKPerKey(windowTopK(2), Seq("nope"), Seq("v" -> false), 1)
    }
    assert(err.getMessage.contains("no column"))
  }

  test("string, null-holding, and negative values order like the window") {
    import spark.implicits._
    val df = Seq(
      ("x", Some(-5.0)), ("x", None), ("x", Some(2.0)), ("y", Some(0.0)),
    ).toDF("k", "v")
    val got = TopKPerKey(df, Seq("k"), Seq("v" -> true), 2)
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toSet
    val want = df.withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy(col("v").asc)))
      .filter(col("rn") <= 2).drop("rn")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(got == want)
  }
}
