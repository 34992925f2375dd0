package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ScalableRank

/** JVM-replay oracle for the two-phase rank (q407/q292 discipline): the
  * operator must be BIT-IDENTICAL to the single-partition global window
  * it replaces, across sizes, bucket counts, and heavy ties — while its
  * produced plan carries no unpartitioned window and no single-partition
  * exchange.
  */
class ScalableRankSpec extends SparkSpec {
  import spark.implicits._

  // 97 distinct v over n rows ⇒ heavy ties: the order is decided by the
  // unique id tiebreak, exactly the contract the operator documents
  private def synth(n: Int) =
    (0 until n).map(k => ((k * 2654435761L) % 97, k.toLong))
      .toDF("v", "id").repartition(8)

  test("withRowNumber equals the global row_number window, ties included") {
    val df = synth(5000)
    val order = Seq(col("v").desc, col("id").asc)
    val got = ScalableRank.withRowNumber(df, order, "r")
    val want = df.withColumn("r",
      row_number().over(Window.orderBy(order: _*)).cast("long"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("withNtile equals the global ntile window across sizes and bucket counts") {
    for (n <- Seq(1, 9, 10, 101, 3000); b <- Seq(1, 3, 10)) {
      val df = synth(n)
      val order = Seq(col("v").asc, col("id").asc)
      val got = ScalableRank.withNtile(df, b, order, "t")
      val want = df.withColumn("t", ntile(b).over(Window.orderBy(order: _*)))
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"n=$n b=$b")
    }
  }

  test("ranks are stable across repeated actions (deterministic ids)") {
    val got = ScalableRank.withRowNumber(
      synth(2000), Seq(col("v").asc, col("id").asc), "r")
    val a = got.orderBy("r").collect().toSeq
    val b = got.orderBy("r").collect().toSeq
    assert(a === b)
  }

  test("produced plan: no unpartitioned window, no single-partition exchange") {
    val got = ScalableRank.withRowNumber(
      synth(1000), Seq(col("v").asc, col("id").asc), "r")
    val p = got.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("empty input yields empty output") {
    assert(ScalableRank.withRowNumber(
      synth(0), Seq(col("id").asc), "r").count() === 0L)
    assert(ScalableRank.withNtile(
      synth(0), 10, Seq(col("id").asc), "t").count() === 0L)
  }

  test("withPrefixSum equals the global running-sum window (rank included)") {
    for (n <- Seq(1, 101, 4000)) {
      val df = synth(n)
      val order = Seq(col("v").asc, col("id").asc)
      val got = ScalableRank.withPrefixSum(df, order, col("v"), "cum", Some("r"))
      val w = Window.orderBy(order: _*)
      val want = df
        .withColumn("r", row_number().over(w).cast("long"))
        .withColumn("cum",
          sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select("v", "id", "r", "cum")
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"n=$n")
    }
    assert(ScalableRank.withPrefixSum(
      synth(0), Seq(col("id").asc), col("v"), "cum").count() === 0L)
  }

  test("withPrefixSum suffixMin equals the global IGNORE-NULLS suffix window") {
    // suffix source: v only on ~1/3 of the rows (nulls elsewhere) — the
    // "next event value at-or-after each row" shape intervalOverlapStats
    // consumes; oracle is the single-partition descending running min
    for (n <- Seq(1, 101, 4000)) {
      val df = synth(n)
        .withColumn("sv", when(col("id") % 3 === 0, col("v")))
      val order = Seq(col("v").asc, col("id").asc)
      val got = ScalableRank.withPrefixSum(df, order, col("v"), "cum",
        rankCol = Some("r"), suffixMin = Some((col("sv"), "nxt")))
      val w = Window.orderBy(order: _*)
      val want = df
        .withColumn("r", row_number().over(w).cast("long"))
        .withColumn("cum",
          sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("nxt",
          min("sv").over(Window.orderBy(col("v").desc, col("id").desc)
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select("v", "id", "sv", "r", "cum", "nxt")
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"n=$n")
      // the tail rows past the last non-null source must read null
      assert(got.filter(col("nxt").isNull).count() ===
        want.filter(col("nxt").isNull).count(), s"n=$n null tail")
    }
  }

  test("withPrefixSum plan: the only window partitions by the range id") {
    val got = ScalableRank.withPrefixSum(
      synth(1000), Seq(col("v").asc, col("id").asc), col("v"), "cum")
    val p = got.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange SinglePartition"), p)
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p)
    windows.foreach(w => assert(w.contains("__sr_pid"), w))
  }
}
