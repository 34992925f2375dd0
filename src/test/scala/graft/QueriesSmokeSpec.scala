package graft

/** Every declared query runs on sf0.001 and yields a non-degenerate
  * result (value correctness is the driver's DuckDB oracle gate +
  * scripts/check_oracle.py; this pins "runs, schema stable, rows
  * plausible" in CI).
  */
class QueriesSmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // candidate-pair queries can legitimately return 0 rows on a tiny SF
  private val mayBeEmpty = Set("q46_minhash_pairs", "q53_embedding_neardup")

  for (q <- SparkEntry.allDefs) {
    test(s"${q.name} runs on sf0.001") {
      val df = q.fn(spark, dir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle names are a subset of query names, and aliases sane") {
    val qnames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
  }
}
