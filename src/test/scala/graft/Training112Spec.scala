package graft

import org.apache.spark.sql.functions._

/** q491 (interval-overlap production twin): verdict-agreement against
  * q85's exact pair output at harness scale — aggregating the declared
  * oracle-truth pair list per purchase must reproduce q491's rows
  * bit-for-bit (count, earliest lag, and the zero-click purchases the
  * left join preserves). A drift between the demo form and the
  * production form — window bounds, lag sign, survivorship — fails
  * here even though both queries hash-match their own oracles.
  */
class Training112Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q491 equals the per-purchase aggregate of q85's exact pairs") {
    val pairs = SparkEntry.queries("q85_interval_join")(spark, dir)
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"))
    val replay = purchases
      .join(
        pairs.groupBy("purchase_id")
          .agg(count(lit(1)).as("n_clicks"), min("lag_us").as("min_lag_us")),
        Seq("purchase_id"), "left")
      .select(col("purchase_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        col("min_lag_us"))
    val got = SparkEntry.queries("q491_interval_overlap")(spark, dir)
    assert(got.count() === purchases.count(),
      "one row per purchase, zero-click purchases included")
    assert(got.unionAll(replay).distinct().count() === got.count(),
      "production twin and pair-replay must agree row-for-row")
    // the interesting branches both fired on harness data
    val counts = got.agg(
      sum(when(col("n_clicks") === 0L, 1L).otherwise(0L)),
      sum(when(col("n_clicks") > 0L, 1L).otherwise(0L))).head()
    assert(counts.getLong(0) > 0L, "some purchase saw no click in-window")
    assert(counts.getLong(1) > 0L, "some purchase saw clicks in-window")
  }
}
