package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Transparent MATERIALIZED-VIEW REWRITE: an optimizer rule that
  * answers a matching aggregate from a pre-computed summary table
  * instead of the base scan — the warehouse feature that turns a
  * 100 TB fact rollup into a kilobyte read, without the query author
  * knowing the MV exists.
  *
  * Scope (deliberately conservative — a rewrite that fires wrongly is
  * a correctness bug, one that doesn't fire is only a slow query):
  * the plan must be Aggregate(single grouping column)(grouping col +
  * count(literal) / sum(col) aggregates) directly over the registered
  * base relation (optionally through a pruning Project of plain
  * attributes). A filter, join, expression grouping, or any other
  * aggregate function disables the rewrite and the query falls back to
  * the base — q370 declares that guard.
  *
  * The rewrite replaces the child with the MV scan and re-aggregates
  * OVER THE MV (count(1) → sum(mv.cnt), sum(x) → sum(mv.sum_x)): the
  * MV is one row per group here, but re-aggregating keeps the rewrite
  * correct even if the MV is stored as multiple partial files. Output
  * attribute ids/names/types are preserved exactly, so parent plan
  * references still resolve.
  *
  * Registration ([[register]]) resolves the base path through the same
  * reader the query uses, so path normalization (file: qualification)
  * cannot drift. A production registry would also fingerprint base
  * snapshot versions for staleness; this registry is per-session-JVM
  * and rebuilt with the MV itself (the declared query's contract).
  */
object MaterializedViewRewrite extends Rule[LogicalPlan] {

  final case class MvDef(mvPath: String, groupCol: String, sumCols: Set[String])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  /** Register `mvPath` (columns: groupCol, cnt, sum_<c> for each c in
    * `sumCols`) as the summary of the parquet base at `basePath`.
    */
  def register(spark: SparkSession, basePath: String, mvPath: String,
      groupCol: String, sumCols: Set[String]): Unit = {
    val base = spark.read.parquet(basePath)
    // sum over DecimalType widens with every re-aggregation level
    // (sum(x): precision+10, sum(sum_x): +20) — the rewrite would hand
    // parents a stale narrower dataType under the original exprId.
    // Integral/floating sums re-aggregate to the same type; decimals
    // are refused here, where the MV author can see it.
    sumCols.foreach { c =>
      base.schema.find(_.name == c).foreach { f =>
        require(!f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType],
          s"MV register($basePath): sum column '$c' is ${f.dataType}; " +
            "DecimalType sums change precision under re-aggregation — not supported")
      }
    }
    rootPathOf(base.queryExecution.analyzed)
      .foreach { p =>
        registry.put(p, MvDef(mvPath, groupCol, sumCols))
        ()
      }
  }

  def clear(): Unit = registry.clear()

  private def rootPathOf(plan: LogicalPlan): Option[String] = plan collectFirst {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).sorted.mkString(",")
      case _ => ""
    }
  }

  /** The registered MV for a child that is the base relation (directly
    * or through an attribute-only pruning Project).
    */
  private def mvFor(child: LogicalPlan): Option[MvDef] = child match {
    case lr: LogicalRelation =>
      rootPathOf(lr).flatMap(p => Option(registry.get(p)))
    case Project(projectList, lr: LogicalRelation)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      rootPathOf(lr).flatMap(p => Option(registry.get(p)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _) =>
        mvFor(child) match {
          case Some(mv) if g.name == mv.groupCol && supported(aggExprs, g, mv) =>
            rewrite(agg, g, aggExprs, mv)
          case _ => agg
        }
    }

  private def supported(aggExprs: Seq[NamedExpression],
      g: AttributeReference, mv: MvDef): Boolean =
    aggExprs.forall {
      case a: AttributeReference => a.exprId == g.exprId
      case Alias(ae: AggregateExpression, _) if !ae.isDistinct &&
          ae.filter.isEmpty && ae.mode == Complete =>
        ae.aggregateFunction match {
          case Count(Seq(l: Literal)) => l.value != null
          case Sum(c: AttributeReference, _) => mv.sumCols.contains(c.name)
          case _ => false
        }
      case _ => false
    }

  private def rewrite(agg: Aggregate, g: AttributeReference,
      aggExprs: Seq[NamedExpression], mv: MvDef): LogicalPlan = {
    val mvPlan = SparkSession.active.read.parquet(mv.mvPath)
      .queryExecution.analyzed
    def mvAttr(name: String): Attribute =
      mvPlan.output.find(_.name == name).getOrElse(
        sys.error(s"MV ${mv.mvPath} lacks column $name"))
    val mvG = mvAttr(mv.groupCol)
    def reAgg(over: Attribute): Expression =
      AggregateExpression(Sum(over), Complete, isDistinct = false)
    val newAggs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference =>
        Alias(mvG, a.name)(exprId = a.exprId)
      case al @ Alias(ae: AggregateExpression, name) =>
        ae.aggregateFunction match {
          case Count(_) =>
            Alias(reAgg(mvAttr("cnt")), name)(exprId = al.exprId)
          case Sum(c: AttributeReference, _) =>
            Alias(reAgg(mvAttr(s"sum_${c.name}")), name)(exprId = al.exprId)
          case other => sys.error(s"unreachable: $other")
        }
      case other => sys.error(s"unreachable: $other")
    }
    // Type guard (belt to register()'s decimal braces): the rewrite
    // reuses the original exprIds, so a re-aggregated expression whose
    // dataType differs from the original output would hand every parent
    // a stale type. Bail out to the base plan on any mismatch — a
    // rewrite that doesn't fire is only a slow query.
    val typesOk = newAggs.zip(agg.aggregateExpressions).forall {
      case (n, o) => n.dataType == o.dataType
    }
    if (typesOk) Aggregate(Seq(mvG), newAggs, mvPlan) else agg
  }
}
