package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level lineage extraction from the ANALYZED logical plan —
  * the data-governance primitive ("which source columns feed this
  * output column?") computed the honest way: by walking expression
  * references through Project/Aggregate/Window/Join/Filter nodes down
  * to relation leaves, keyed by `ExprId` (NOT by column-name matching,
  * which breaks on aliases and self-joins).
  *
  * `tableOf` names a leaf relation from its file location (the harness
  * reads parquet directories named after the table). Filter/join
  * PREDICATE columns are deliberately excluded — this is value
  * lineage (what flows INTO the column), the narrow form auditors ask
  * for first; control lineage would union the predicate references in.
  */
object Lineage {

  /** (output_column, source_table, source_column) edges, sorted. */
  def columnLineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    // exprId -> set of (table, column) at the leaves, built bottom-up
    val prov = scala.collection.mutable.Map.empty[Long, Set[(String, String)]]

    def tableOf(rel: LogicalRelation): String = rel.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("unknown")
      case _ => "unknown"
    }

    def refs(e: Expression): Set[(String, String)] =
      e.references.toSeq.flatMap(a => prov.getOrElse(a.exprId.id, Set.empty))
        .toSet

    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      p match {
        case rel: LogicalRelation =>
          val tbl = tableOf(rel)
          rel.output.foreach(a => prov(a.exprId.id) = Set((tbl, a.name)))
        case Project(exprs, _) => exprs.foreach(record)
        case Aggregate(_, exprs, _, _) => exprs.foreach(record)
        case w: Window => w.windowExpressions.foreach(record)
        case u: Union =>
          // Union's output reuses the FIRST child's ExprIds — without
          // merging, every other branch's sources silently vanish from
          // the report. Fold each branch's provenance into the output
          // attribute position-by-position.
          u.children.foreach { child =>
            u.output.zip(child.output).foreach { case (out, in) =>
              prov(out.exprId.id) = prov.getOrElse(out.exprId.id, Set.empty) ++
                prov.getOrElse(in.exprId.id, Set.empty)
            }
          }
        case g: Generate =>
          // explode/posexplode: generated columns derive from the
          // generator's references
          g.generatorOutput.foreach(a => prov(a.exprId.id) = refs(g.generator))
        case _ => // joins/filters/aliases pass attributes through by id
      }
    }

    def record(ne: NamedExpression): Unit = ne match {
      case a: Attribute => // passthrough keeps its existing provenance
        if (!prov.contains(a.exprId.id)) prov(a.exprId.id) = Set.empty
      case other => prov(other.exprId.id) = refs(other)
    }

    walk(plan)
    plan.output.flatMap { a =>
      prov.getOrElse(a.exprId.id, Set.empty).toSeq
        .map { case (t, c) => (a.name, t, c) }
    }.sortBy(identity).toSeq
  }
}
