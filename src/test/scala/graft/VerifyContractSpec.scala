package graft

/** Regression for the driver contract itself: Verify.main must produce
  * one parquet dir per query plus a parseable oracle_sql.json whose
  * keys all exist in the query map.
  */
class VerifyContractSpec extends SparkSpec {
  test("Verify.main writes per-query parquet + well-formed oracle_sql.json") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify_out").toString
    Verify.run(spark, "/root/testdata/sf0.001", out)
    val dirs = new java.io.File(out).listFiles.filter(_.isDirectory).map(_.getName).toSet
    assert(SparkEntry.queries.keySet.subsetOf(dirs),
      s"missing results: ${SparkEntry.queries.keySet -- dirs}")
    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    // minimal JSON sanity: parses as a flat object via the same escapes
    assert(json.startsWith("{") && json.endsWith("}"))
    for (k <- SparkEntry.oracleSql.keys) assert(json.contains("\"" + k + "\""), k)
  }
}
