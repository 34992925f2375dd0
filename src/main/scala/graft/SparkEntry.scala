package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's declared capabilities live in per-domain catalogs
  * (graft.queries.*); each entry is a Spark implementation plus, where
  * SQL-expressible, a DuckDB oracle the driver hash-compares against.
  */
object SparkEntry {
  def allDefs: Seq[QueryDef] =
    graft.queries.Relational.defs ++
      graft.queries.Relational2.defs ++
      graft.queries.Relational3.defs ++
      graft.queries.WaferOps.defs ++
      graft.queries.Events.defs ++
      graft.queries.Text.defs ++
      graft.queries.Vectors.defs ++
      graft.queries.Advanced.defs ++
      graft.queries.Training.defs ++
      graft.queries.Training2.defs ++
      graft.queries.Training3.defs ++
      graft.queries.Training4.defs ++
      graft.queries.Training5.defs ++
      graft.queries.Training6.defs ++
      graft.queries.Training7.defs ++
      graft.queries.Training8.defs ++
      graft.queries.Training9.defs ++
      graft.queries.Training10.defs ++
      graft.queries.Training11.defs ++
      graft.queries.Training12.defs ++
      graft.queries.Training13.defs ++
      graft.queries.Training14.defs ++
      graft.queries.Training15.defs ++
      graft.queries.Training16.defs ++
      graft.queries.Training17.defs ++
      graft.queries.Training18.defs ++
      graft.queries.Training19.defs ++
      graft.queries.Training20.defs ++
      graft.queries.Training21.defs ++
      graft.queries.Training22.defs ++
      graft.queries.Training23.defs ++
      graft.queries.Training24.defs ++
      graft.queries.Training25.defs ++
      graft.queries.Training26.defs ++
      graft.queries.Training27.defs ++
      graft.queries.Training28.defs ++
      graft.queries.Training29.defs ++
      graft.queries.Training30.defs ++
      graft.queries.Training31.defs ++
      graft.queries.Training32.defs ++
      graft.queries.Training33.defs ++
      graft.queries.Training34.defs ++
      graft.queries.Training35.defs ++
      graft.queries.Training36.defs ++
      graft.queries.Training37.defs ++
      graft.queries.Training38.defs ++
      graft.queries.Training39.defs ++
      graft.queries.Training40.defs ++
      graft.queries.Training41.defs ++
      graft.queries.Training42.defs ++
      graft.queries.Training43.defs ++
      graft.queries.Training44.defs ++
      graft.queries.Training45.defs ++
      graft.queries.Training46.defs ++
      graft.queries.Training47.defs ++
      graft.queries.Training48.defs ++
      graft.queries.Training49.defs ++
      graft.queries.Training50.defs ++
      graft.queries.Training51.defs ++
      graft.queries.Training52.defs ++
      graft.queries.Training53.defs ++
      graft.queries.Training54.defs ++
      graft.queries.Training55.defs ++
      graft.queries.Training56.defs ++
      graft.queries.Training57.defs ++
      graft.queries.Training58.defs ++
      graft.queries.Training59.defs ++
      graft.queries.Training60.defs ++
      graft.queries.Training61.defs ++
      graft.queries.Training62.defs ++
      graft.queries.Training63.defs ++
      graft.queries.Training64.defs ++
      graft.queries.Training65.defs ++
      graft.queries.Training66.defs ++
      graft.queries.Training67.defs ++
      graft.queries.Training68.defs ++
      graft.queries.Training69.defs ++
      graft.queries.Training70.defs ++
      graft.queries.Training71.defs ++
      graft.queries.Training72.defs ++
      graft.queries.Training73.defs ++
      graft.queries.Training74.defs ++
      graft.queries.Training75.defs ++
      graft.queries.Training76.defs ++
      graft.queries.Training77.defs ++
      graft.queries.Training78.defs ++
      graft.queries.Training79.defs ++
      graft.queries.Training80.defs ++
      graft.queries.Training81.defs ++
      graft.queries.Training82.defs ++
      graft.queries.Training83.defs ++
      graft.queries.Training84.defs ++
      graft.queries.Training85.defs ++
      graft.queries.Training86.defs ++
      graft.queries.Training87.defs ++
      graft.queries.Training88.defs ++
      graft.queries.Training89.defs ++
      graft.queries.Training90.defs ++
      graft.queries.Training91.defs ++
      graft.queries.Training92.defs ++
      graft.queries.Training93.defs ++
      graft.queries.Training94.defs ++
      graft.queries.Training95.defs ++
      graft.queries.Training96.defs ++
      graft.queries.Training97.defs ++
      graft.queries.Training98.defs ++
      graft.queries.Training99.defs ++
      graft.queries.Training100.defs ++
      graft.queries.Training101.defs ++
      graft.queries.Training102.defs ++
      graft.queries.Training103.defs ++
      graft.queries.Training104.defs ++
      graft.queries.Training105.defs ++
      graft.queries.Training106.defs ++
      graft.queries.Training107.defs ++
      graft.queries.Training108.defs ++
      graft.queries.Training109.defs ++
      graft.queries.Training110.defs ++
      graft.queries.Training111.defs ++
      graft.queries.Training112.defs ++
      graft.queries.Multimodal.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.find(_.name == "q03_revenue_by_nation").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
