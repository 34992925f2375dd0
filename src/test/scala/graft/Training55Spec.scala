package graft

import org.apache.spark.sql.functions._

/** Invariants for the fifty-fifth wave (q334-q335): CSV round-trip
  * fidelity checked field-for-field in the JVM (not just digests), and
  * the three-valued-logic law derived from first principles.
  */
class Training55Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)

  test("q334: read-back CSV fields equal the planted strings exactly") {
    q("q334_csv_quoting").collect() // materialize the CSV dir
    val csvDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft_csvq_${Integer.toHexString(dir.hashCode)}").toString
    val back = spark.read
      .schema("doc_id BIGINT, source STRING, hostile STRING")
      .option("header", "true").option("multiLine", "true")
      .csv(csvDir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(back.size === docs.length)
    docs.foreach { case (id, src) =>
      val expect = s"""v,$id"q"\n$src"""
      assert(back(id) === expect, s"doc $id hostile field mangled")
    }
    // without multiLine the embedded newline splits records — the bug
    // the option exists for; prove the failure mode is real
    val naive = spark.read
      .schema("doc_id BIGINT, source STRING, hostile STRING")
      .option("header", "true")
      .csv(csvDir).count()
    assert(naive !== docs.length.toLong,
      "single-line mode must mis-parse the embedded newlines")
  }

  test("q335: three-valued-logic law from first principles") {
    val r = q("q335_not_in_null_semantics").collect().head
    val (withNull, clean, notExists) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(withNull === 0L,
      "one NULL in the probe set must empty NOT IN (UNKNOWN for every row)")
    val supp = Tables(spark, dir, "supplier")
      .select(col("s_nationkey").cast("long")).collect().map(_.getLong(0)).toSet
    val cust = Tables(spark, dir, "customer")
      .select(col("c_nationkey").cast("long")).collect().map(_.getLong(0))
    val complement = cust.count(k => !supp.contains(k)).toLong
    assert(clean === complement, "clean NOT IN = set complement")
    assert(notExists === complement, "NOT EXISTS is null-safe")
  }
}
