package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Expression, In, InSet, Literal}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, HintInfo, LocalRelation, LogicalPlan, BROADCAST}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DateType, DecimalType, IntegerType, LongType, ShortType, StringType, TimestampType}

/** Production rewrite for oversized literal IN-lists: a predicate like
  * `key IN (v1, …, v5000)` is O(list) PER ROW when interpreted (InSet
  * hashes, but codegen switch tables stop at
  * `spark.sql.optimizer.inSetSwitchThreshold` and giant predicate trees
  * bloat the generated method past JIT limits), and the literal list is
  * serialized into EVERY task binary. Rewritten as a LEFT SEMI join
  * against a broadcast LocalRelation of the values, the list ships once
  * per executor as a broadcast hash relation and the probe is a plain
  * hash lookup — the shape that survives a 100k-element manifest at
  * 100 TB.
  *
  * Soundness: for non-null literal lists, `a IN (…)` as a FILTER keeps
  * exactly the rows some literal equals — the same set a LEFT SEMI
  * equi-join keeps (NULL probe keys match nothing in either form; a
  * NULL in the list makes IN three-valued, so such lists are skipped).
  * Conf: `spark.graft.inListJoin` (default true),
  * `spark.graft.inListJoin.threshold` (default 32 values).
  */
object InListToJoinRewrite extends Rule[LogicalPlan] {
  val flag = "spark.graft.inListJoin"
  val thresholdFlag = "spark.graft.inListJoin.threshold"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flag, "true").toBoolean) plan
    else {
      val threshold = conf.getConfString(thresholdFlag, "32").toInt
      plan.transform {
        case f @ Filter(cond, child) =>
          val conjuncts = splitConjuncts(cond)
          val (rewritable, kept) = conjuncts.partition(isBigInList(_, threshold, child))
          if (rewritable.isEmpty) f
          else {
            val filtered =
              if (kept.isEmpty) child
              else Filter(kept.reduce(And), child)
            rewritable.foldLeft(filtered) { (p, c) => toSemiJoin(c, p) }
          }
      }
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Exact-equality key types (floating point excluded: NaN/-0.0 join
    * semantics differ subtly from predicate evaluation).
    */
  private def keyType(t: DataType): Boolean = t match {
    case IntegerType | LongType | ShortType | ByteType | StringType |
        DateType | TimestampType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Literal values of a rewritable IN: attribute probe, exact-equality
    * type, all-literal, no NULL literal, list size over the threshold.
    */
  private def inValues(e: Expression, threshold: Int): Option[(Attribute, Seq[Any])] = e match {
    case In(a: Attribute, list)
        if keyType(a.dataType) && list.length >= threshold &&
          list.forall(v => v.isInstanceOf[Literal] && v.asInstanceOf[Literal].value != null) =>
      Some((a, list.map(_.asInstanceOf[Literal].value)))
    case InSet(a: Attribute, hset)
        if keyType(a.dataType) && hset.size >= threshold &&
          !hset.contains(null) =>
      Some((a, hset.toSeq))
    case _ => None
  }

  private def isBigInList(e: Expression, threshold: Int, child: LogicalPlan): Boolean =
    inValues(e, threshold).exists { case (a, _) => child.outputSet.contains(a) }

  private def toSemiJoin(e: Expression, child: LogicalPlan): LogicalPlan = {
    val (attr, values) = inValues(e, Int.MinValue).get
    val valueAttr = AttributeReference("graft_in_value", attr.dataType, nullable = false)()
    val rows = values.distinct.map(v => InternalRow(v))
    val local = LocalRelation(Seq(valueAttr), rows)
    Join(child, local, LeftSemi, Some(EqualTo(attr, valueAttr)),
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
  }
}
