package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions surface: a session built with
  * GraftExtensions gets (a) graft_cosine in SQL with no register() call,
  * and (b) the percentile→approx_percentile optimizer rewrite under the
  * spark.graft.approxQuantiles flag.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val session: SparkSession = {
    // build a sibling session (same JVM/SparkContext) that actually goes
    // through the extensions injection path
    graft.SparkSpec.session // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(graft.SparkSpec.session)
    SparkSession.setActiveSession(graft.SparkSpec.session)
    s
  }

  test("injected graft_cosine is available in SQL without register()") {
    val r = session.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("approxQuantiles flag rewrites exact percentile to t-digest") {
    import session.implicits._
    val df = Seq.tabulate(1000)(i => ("g", i.toDouble)).toDF("g", "x")
    df.createOrReplaceTempView("ext_probe")
    val q = "SELECT percentile(x, 0.5) AS p FROM ext_probe GROUP BY g"

    session.conf.set(ApproxQuantileRewrite.flag, "false")
    val exactPlan = session.sql(q).queryExecution.optimizedPlan.toString
    assert(exactPlan.contains("percentile") && !exactPlan.contains("percentile_approx"))

    session.conf.set(ApproxQuantileRewrite.flag, "true")
    try {
      val approxPlan = session.sql(q).queryExecution.optimizedPlan.toString
      assert(approxPlan.contains("percentile_approx"),
        s"expected rewrite, got:\n$approxPlan")
      // t-digest at this accuracy is exact on 1000 values
      assert(math.abs(session.sql(q).head().getDouble(0) - 499.5) <= 1.0)
    } finally session.conf.set(ApproxQuantileRewrite.flag, "false")
  }

  test("the rewrite also covers multi-cutpoint percentile arrays (the q146 grid)") {
    import session.implicits._
    val df = Seq.tabulate(1000)(i => ("g", i.toDouble)).toDF("g", "x")
    df.createOrReplaceTempView("ext_probe_grid")
    // the q146 KS-grid shape: one percentile call, an array of cutpoints
    val q = "SELECT percentile(x, array(0.25, 0.5, 0.75)) AS ps FROM ext_probe_grid GROUP BY g"
    session.conf.set(ApproxQuantileRewrite.flag, "true")
    try {
      val plan = session.sql(q).queryExecution.optimizedPlan.toString
      assert(plan.contains("percentile_approx"), s"expected rewrite, got:\n$plan")
      val ps = session.sql(q).head().getSeq[Double](0)
      assert(ps.length == 3)
      assert(math.abs(ps(1) - 499.5) <= 1.0)
    } finally session.conf.set(ApproxQuantileRewrite.flag, "false")
  }
}
