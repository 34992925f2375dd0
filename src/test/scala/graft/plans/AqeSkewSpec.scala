package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join splitting actually fires on a pathologically skewed
  * key — the runtime backstop behind SaltedJoin (manual salting is the
  * escalation when even AQE's split granularity isn't enough).
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition of a sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k rows on ONE key + 1k spread over 100 keys; payload pads bytes
      val left = spark.range(100000).select(
        lit(0L).as("k"), md5(col("id").cast("string")).as("pad")) // incompressible payload
        .unionAll(spark.range(1000).select((col("id") % 100 + 1).as("k"),
          col("id").cast("string").as("pad")))
      val right = spark.range(101).select(col("id").as("k"),
        col("id").cast("string").as("rv"))
      // global agg downstream — a groupBy on the join key would forbid
      // the split (it would invalidate the required output partitioning).
      // max(length(pad)) keeps the wide payload column alive through the
      // shuffle: with only the constant key shuffled, compression would
      // push the hot partition under the skew threshold.
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), max(length(col("pad"))).as("mx"))
      joined.collect()
      val exec = joined.queryExecution.executedPlan
      val adaptive = (exec.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(exec)).toString
      assert(adaptive.contains("skew=true"), adaptive)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
