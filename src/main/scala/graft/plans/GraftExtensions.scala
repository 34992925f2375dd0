package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Session-level exactness dial for quantiles.
  *
  * Exact `percentile` buffers every group value (sorted) — fine for
  * oracle parity at test SFs, unusable over a 100 TB group-by (measured:
  * 55s of a 68s wafer run at 6.4M rows is exact-percentile buffering).
  * With `spark.graft.approxQuantiles=true`, every exact Percentile
  * aggregate in the optimized plan is rewritten to the t-digest
  * ApproximatePercentile — single-pass, mergeable partials, bounded
  * memory — without touching query code.
  *
  * The rewrite is limited to DoubleType inputs: Percentile always emits
  * double, while ApproximatePercentile emits its input type, so a wider
  * match would change the plan's schema.
  */
object ApproxQuantileRewrite extends Rule[LogicalPlan] {
  val flag = "spark.graft.approxQuantiles"
  val accuracyFlag = "spark.graft.approxQuantiles.accuracy"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flag, "false").toBoolean) plan
    else {
      val accuracy = conf.getConfString(accuracyFlag, "10000").toInt
      plan.transformAllExpressions {
        case ae: AggregateExpression =>
          ae.aggregateFunction match {
            // !p.reverse: a descending PERCENTILE_CONT (WITHIN GROUP
            // ORDER BY v DESC) carries reverse=true — rewriting it to
            // the ascending ApproximatePercentile would return ~the
            // (1-p) quantile, silently wrong, not merely approximate
            case p: Percentile if p.child.dataType == DoubleType &&
                p.frequencyExpression == Literal(1L) && !p.reverse =>
              ae.copy(aggregateFunction = new ApproximatePercentile(
                p.child, p.percentageExpression, Literal(accuracy)))
            case _ => ae
          }
      }
    }
}

/** Engine extension entry point — activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`). Injects the optimizer rule
  * above and the native cosine expression, so a plain SQL user gets the
  * full surface without calling register() APIs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ApproxQuantileRewrite)
    ext.injectOptimizerRule(_ => MaterializedViewRewrite)
    ext.injectOptimizerRule(_ => InListToJoinRewrite)
    ext.injectFunction(graft.functions.CosineSimilarity.functionDescription)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ngrams"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.NGramGenerator].getCanonicalName, "graft_ngrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.NGramGenerator(exprs(0), exprs(1))))
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
