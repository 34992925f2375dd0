package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Module-level functional wrappers mirroring the reference's
  * convenience API (SURVEY.md §2 H: src/preprocessing.py:287-355,
  * src/data_loader.py:61-77). The reference's `run_kmeans_by_step`
  * wrapper silently drops its seed parameter (preprocessing.py:317-322);
  * we do not copy that bug — seed is forwarded.
  */
package object wafer {
  def loadData(spark: SparkSession, path: String, encoding: String = "UTF-8"): DataFrame =
    WaferPipeline.loadCsv(spark, path, encoding)

  def removeOutliersByClass(df: DataFrame, iqrMultiplier: Double = 1.5): DataFrame =
    WaferPipeline.removeOutliersByClass(df, iqrMultiplier)

  def addEngineeredFeatures(df: DataFrame): DataFrame =
    WaferPipeline.addEngineeredFeatures(df)

  def runKMeansByStep(
      df: DataFrame,
      steps: Seq[String] = WaferSchema.defaultSteps,
      k: Int = 2,
      seed: Long = 42L): DataFrame =
    WaferPipeline.runKMeansByStep(df, steps, k, seed)

  def labelKillerDefects(
      df: DataFrame,
      mapping: Map[String, Int] = WaferSchema.killerClusterMapping): DataFrame =
    WaferPipeline.labelKillerDefects(df, mapping)
}
