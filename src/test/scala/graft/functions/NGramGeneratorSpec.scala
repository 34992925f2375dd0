package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom generator must behave exactly like the built-in
  * generator contract: zero rows for null/short inputs, correct
  * positions, a Generate node in the plan, LATERAL VIEW SQL surface,
  * and equality with the composed transform/concat shingling.
  */
class NGramGeneratorSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, "a b c d"),
      (2L, "x y"), // shorter than n=3: zero rows
      (3L, ""), // empty: zero rows
      (4L, "p q r")).toDF("id", "text")
  }

  test("generator emits (pos, ngram) windows; short inputs emit nothing") {
    NGramGenerator.register(spark)
    val out = df.select(col("id"),
      expr("graft_ngrams(filter(split(text, ' '), w -> w <> ''), 3)"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(out === Set(
      (1L, 0, "a b c"), (1L, 1, "b c d"), (4L, 0, "p q r")))
  }

  test("plans through a Generate node (the UDTF contract)") {
    NGramGenerator.register(spark)
    val p = df.select(expr("graft_ngrams(split(text, ' '), 2)"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("Generate"), p)
    assert(p.contains("graft_ngrams"), p)
  }

  test("LATERAL VIEW SQL surface works") {
    NGramGenerator.register(spark)
    df.createOrReplaceTempView("ngram_docs")
    val rows = spark.sql("""
      SELECT id, g.pos, g.ngram
      FROM ngram_docs
      LATERAL VIEW graft_ngrams(filter(split(text, ' '), w -> w <> ''), 2) g
        AS pos, ngram
      WHERE id = 4""").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet ===
      Set((4L, 0, "p q"), (4L, 1, "q r")))
  }

  test("equals the composed transform/concat shingling on real data") {
    NGramGenerator.register(spark)
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(expr("filter(split(text, ' '), w -> w <> '')").as("tk"))
    val viaUdtf = docs.select(expr("graft_ngrams(tk, 3)"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaLambdas = docs
      .select(explode(expr(
        """transform(slice(tk, 1, greatest(size(tk) - 2, 0)),
           (x, i) -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))"""))
        .as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaUdtf.nonEmpty && viaUdtf === viaLambdas)
  }
}
