package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-facing dedup API over a document frame (id column + text
  * column): exact, MinHash-LSH, and SimHash. Thin composition over
  * TextOps' per-row expressions — each step is codegen'd, and the only
  * shuffles are the group-by/band joins that define the algorithms.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content hash with the
    * surviving (minimum) id and the duplicate count.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(idCol).as(s"keeper_$idCol"), count(lit(1)).as("n_copies"))

  /** Per-document MinHash-LSH band keys over word-3-gram shingles:
    * returns (idCol, band0..band{bands-1}). Documents sharing any band
    * are near-dup candidates.
    */
  def minhashBands(
      df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    df.withColumn("__wh", expr(TextOps.wordHashesSpark(textCol)))
      .withColumn("__hh", expr(TextOps.ngramHashesSpark(3, "__wh")))
      .select(
        (col(idCol) +:
          (0 until bands).map(b =>
            expr(TextOps.bandSpark(b, rowsPerBand, "__hh")).as(s"band$b"))): _*)

  /** Candidate near-dup pairs (idA < idB) from minhashBands output. */
  def minhashCandidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val bands = bandsDf.columns.filter(_.startsWith("band"))
    val stacked = bandsDf.select(col(idCol),
      posexplode(array(bands.map(col): _*)).as(Seq("band_idx", "band_key")))
    stacked.as("a").join(stacked.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as(s"${idCol}_a"), col(s"b.$idCol").as(s"${idCol}_b"))
      .distinct()
  }

  /** Per-document SimHash signature (near-dups have small hamming
    * distance).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame =
    df.withColumn("__wh", expr(TextOps.wordHashesSpark(textCol)))
      .select(col(idCol), expr(TextOps.simhashSpark("__wh", bits)).as(s"simhash$bits"))
}
