package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Semantic invariants for the training-data-prep family, checked on the
  * harness tables (sf0.001) — properties, not pinned values, so they
  * hold at any SF.
  */
class TrainingOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)
  private def docs = graft.Tables(spark, dir, "documents")

  test("q93 stratified sample keeps exactly ceil(n/5) per stratum") {
    val kept = q("q93_stratified_sample")
      .groupBy("lang", "source").agg(count(lit(1)).as("k"))
    val expected = docs.groupBy("lang", "source")
      .agg(expr("cast(ceil(count(*) / 5.0) as bigint)").as("e"))
    val joined = kept.join(expected, Seq("lang", "source"), "full")
    assert(joined.filter(col("k").isNull || col("e").isNull || col("k") =!= col("e")).count() === 0L)
  }

  test("q94 packs never exceed budget + one doc; token mass conserved") {
    val budget = 512
    val packs = q("q94_sequence_packing").cache()
    val maxDoc = docs
      .select(expr("cast(size(split(text, ' ')) as bigint)").as("t"))
      .agg(max("t")).head.getLong(0)
    val over = packs.filter(col("pack_tokens") > budget + maxDoc).count()
    assert(over === 0L, s"a pack overflows budget+maxDoc ($budget+$maxDoc)")
    val packed = packs.agg(sum("pack_tokens")).head.getLong(0)
    val total = docs
      .agg(sum(expr("cast(size(split(text, ' ')) as bigint)"))).head.getLong(0)
    assert(packed === total, "every token lands in exactly one pack")
    packs.unpersist()
  }

  test("q96 mixture matches an independent JVM md5-threshold oracle") {
    val weights = Map("en" -> 4L, "de" -> 2L, "es" -> 2L, "fr" -> 1L, "zh" -> 1L)
    def th(num: Long): Long = (1L << 60) / 10 * num
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
    }
    val expected = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, lang) => hash60(id.toString) < th(weights.getOrElse(lang, 0L)) }
      .groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val got = q("q96_mixture_rebalance").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("equi-depth bins partition the input with monotone ranges") {
    val customers = graft.Tables(spark, dir, "customer")
    val bins = EquiDepthBins.globalBins(customers, "c_acctbal", bins = 10)
      .orderBy("bin").collect()
    assert(bins.map(_.getLong(1)).sum === customers.count())
    assert(bins.length <= 10)
    // ranges ordered and non-overlapping: hi(b) <= lo(b+1)
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(3) <= b.getDouble(2),
          s"bin ${a.getLong(0)} hi > bin ${b.getLong(0)} lo")
      case _ =>
    }
    // equi-depth: no bin is empty and the largest/smallest differ by
    // at most the tie mass at a boundary — here just sanity-bound it
    val ns = bins.map(_.getLong(1))
    assert(ns.min > 0)
  }

  test("q97 normalization is idempotent") {
    import spark.implicits._
    val norm = (s: String) =>
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    val texts = docs.select("text").as[String].take(50)
    texts.foreach(t => assert(norm(norm(t)) === norm(t)))
  }
}
