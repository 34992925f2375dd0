package graft

/** The SQL-first user surface: Graft.registerTables makes every harness
  * table addressable from spark.sql.
  */
class GraftSqlSpec extends SparkSpec {
  test("registerTables exposes every table to spark.sql") {
    val names = Graft.registerTables(spark, "/root/testdata/sf0.001")
    assert(names.toSet === Tables.all.toSet)
    val n = spark.sql(
      """SELECT n_name, count(*) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""").count()
    assert(n === 25L)
    assert(spark.sql("SELECT count(*) FROM events").head.getLong(0) > 0)
  }
}
