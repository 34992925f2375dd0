package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key salting.
  *
  * AQE's skew-join handling (on by default) splits oversized shuffle
  * partitions at runtime and is the first line of defense. Salting is
  * the explicit escalation for pathological hot keys — e.g. a single
  * join key holding >10% of 100 TB — where even a split partition's
  * build side won't fit: the left (large, skewed) side scatters each
  * row to one of `saltFactor` sub-keys; the right side replicates each
  * row to all of them. The shuffle then spreads a hot key over
  * `saltFactor` reducers at the cost of a `saltFactor`× blow-up of the
  * right side — so use it with a small-ish right side and a factor
  * sized to the observed skew, ideally applied only to the hot keys
  * (filter + union with a plain join for the rest).
  *
  * The salt is pmod(hash(all left columns, seed), saltFactor) — a pure
  * function of the row, so the scatter is identical under any
  * partitioning, task retry, or AQE re-plan (rand(seed) is only stable
  * for a fixed partitioning). Rows of a hot key spread across salts as
  * long as they differ in any column; fully identical duplicate rows
  * co-locate, which is the best any deterministic scheme can do.
  */
object SaltedJoin {
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 8,
      seed: Long = 42L): DataFrame = {
    require(saltFactor > 0)
    val salted = left.withColumn("__salt",
      pmod(hash((left.columns.map(col) :+ lit(seed)).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
