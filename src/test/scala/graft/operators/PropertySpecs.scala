package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the operator invariants SURVEY.md §5.2 pins:
  * outlier removal is monotone (output ⊆ input), upper-bound-only, and
  * consistent across the exact and approx quantile paths, on generated
  * data (ScalaCheck generators, fixed seeds → deterministic CI).
  */
class IqrPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen = Gen.listOfN(60, for {
    g <- Gen.oneOf("g1", "g2", "g3")
    v <- Gen.oneOf(
      Gen.choose(0.0, 100.0),
      Gen.const(1e6), // planted extreme
      Gen.choose(-50.0, 0.0))
  } yield (g, v))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("IQR filter: output subset of input, minimum survives, both quantile paths") {
    for (seed <- 1L to 5L) {
      val rows = sample(rowsGen, seed)
      val df = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
        .toDF("id", "g", "v")
      for (exact <- Seq(true, false)) {
        val out = IqrOutlierFilter(df, Seq("g"), Seq("v"), exact = exact)
        val inIds = rows.indices.map(_.toLong).toSet
        val outRows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        assert(outRows.map(_._1).toSet.subsetOf(inIds), s"output ⊆ input (seed=$seed)")
        // upper-only: each group's input minimum is never removed
        val minByGroup = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).min }
        for ((g, m) <- minByGroup) {
          assert(outRows.filter(_._2 == g).map(_._3).minOption.contains(m),
            s"group $g minimum $m must survive (exact=$exact, seed=$seed)")
        }
      }
    }
  }
}

class TextPropertySpec extends SparkSpec {

  private val wordsGen = Gen.chooseNum(1, 40).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("spark", "wafer", "defect", "scan", "etch", "probe")))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("ngram hashes: distinct count bounded by shingle count; jaccard(self)=1") {
    for (seed <- 1L to 10L) {
      val words = sample(wordsGen, seed)
      val text = words.mkString(" ")
      val df = spark.sql(s"SELECT '$text' AS text")
        .selectExpr(s"${TextOps.wordHashesSpark()} AS wh")
        .selectExpr(s"${TextOps.ngramHashesSpark(3, "wh")} AS ng")
      val ng = df.head.getSeq[Long](0)
      val expectedMax = if (words.size >= 3) words.size - 2 else words.size
      assert(ng.size <= expectedMax, s"distinct shingles bounded (seed=$seed)")
      assert(ng.nonEmpty)
      val j = df.selectExpr(s"${TextOps.jaccardSpark("ng", "ng")} AS j").head.getDouble(0)
      assert(j === 1.0)
    }
  }
}
