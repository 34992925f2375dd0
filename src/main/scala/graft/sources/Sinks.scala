package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Write-side layout strategies as a library surface. Each wraps the
  * plain DataFrameWriter API with the layout decision that matters at
  * 100 TB:
  *
  *   - partitioned: coarse, low-cardinality columns → partition
  *     pruning at the file index (SourcesSpec proves the pruned scan);
  *   - bucketed: pre-shuffled-on-disk join/agg keys → co-located
  *     SortMergeJoin with zero exchanges;
  *   - sorted-within-partitions: clusters values inside each file so
  *     parquet row-group min/max stats actually skip (a random layout
  *     makes every row group's [min,max] span everything).
  *
  * `streamUpsert` closes the streaming loop: each microbatch MERGEs
  * into a key-deduped snapshot (latest version wins). Without an ACID
  * table format offline, snapshots are versioned directories — batch
  * N+1 reads snapshot N and writes snapshot N+1, never overwriting
  * what it reads; `readLatestSnapshot` resolves the newest complete
  * one. On a real deployment the body of the foreachBatch is a Delta/
  * Iceberg MERGE INTO and everything else stays identical.
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def writeBucketedTable(
      df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol).saveAsTable(table)

  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String]): Unit =
    df.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Streaming MERGE-upsert sink: per microbatch, union the batch with
    * the previous snapshot and keep the highest-`versionCol` row per
    * key (ties broken toward the incoming batch).
    */
  def streamUpsert(
      stream: DataFrame, checkpoint: String, snapshotRoot: String,
      keyCols: Seq[String], versionCol: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val incoming = batch.withColumn("__src", lit(1))
        val merged = latestSnapshotDir(snapshotRoot) match {
          case Some(prev) =>
            spark.read.parquet(prev).withColumn("__src", lit(0))
              .unionByName(incoming)
          case None => incoming
        }
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(versionCol).desc, col("__src").desc)
        merged
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn", "__src")
          .write.mode("overwrite").parquet(s"$snapshotRoot/v$batchId")
        ()
      }
      .start()

  /** Compact a parquet directory to ~`targetFileBytes` files — the
    * maintenance pass every long-running upsert/streaming sink needs:
    * each microbatch writes at least one file per task, so a snapshot
    * accumulates small files and every downstream scan pays one task +
    * one footer read per file. Rewrites through `coalesce` (a shuffle-
    * free partition merge — compaction is IO-bound, never worth a
    * shuffle) unless `sortCols` is given, in which case rows are
    * re-clustered (repartition + sortWithinPartitions) so parquet
    * row-group min/max stats skip again after the rewrite.
    *
    * Swap is write-aside-then-rename via the Hadoop FileSystem API (the
    * same code path works on HDFS/S3A on a real cluster): the original
    * directory is never overwritten in place while being read. Readers
    * racing the final rename see the old or the new directory, not a
    * mix — the offline stand-in for an ACID table format's commit, same
    * caveat as streamUpsert.
    *
    * Returns (filesBefore, filesAfter); no-op if already at or below
    * the target count.
    */
  def compactSnapshot(
      spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(target)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val nBefore = dataFiles.length
    val totalBytes = dataFiles.map(_.getLen).sum
    val nAfter = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    if (nAfter >= nBefore) return (nBefore, nBefore)
    val df = spark.read.parquet(dir)
    val rewritten =
      if (sortCols.nonEmpty)
        df.repartition(nAfter).sortWithinPartitions(sortCols.map(col): _*)
      else df.coalesce(nAfter)
    val tmp = new Path(dir + "__compact_tmp")
    rewritten.write.mode("overwrite").parquet(tmp.toString)
    val old = new Path(dir + "__compact_old")
    if (!fs.rename(target, old)) sys.error(s"compact: cannot move $dir aside")
    if (!fs.rename(tmp, target)) { fs.rename(old, target); sys.error(s"compact: cannot swap in $tmp") }
    fs.delete(old, true)
    (nBefore, nAfter)
  }

  def readLatestSnapshot(spark: SparkSession, snapshotRoot: String): DataFrame =
    spark.read.parquet(latestSnapshotDir(snapshotRoot)
      .getOrElse(sys.error(s"no snapshot under $snapshotRoot")))

  private def latestSnapshotDir(root: String): Option[String] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v") &&
        new java.io.File(f, "_SUCCESS").exists())
      .sortBy(f => f.getName.drop(1).toLong)
      .lastOption.map(_.getAbsolutePath)
  }
}
