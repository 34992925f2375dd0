package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.PlanApi

/** Whole-operator custom plan: exact top-k rows per key, executed as a
  * bounded per-key heap instead of the window-function rewrite
  * (`row_number() OVER (PARTITION BY … ORDER BY …) <= k`).
  *
  * Why a physical operator and not the window: the window plan must
  * SORT every partition on (key, order) — at 100 TB that is a full
  * spillable sort of the fact table just to throw away all but k rows
  * per key. This exec holds at most k rows per key (k·|keys per
  * partition| memory, no sort buffer, no spill) and streams everything
  * else past. The declared `ClusteredDistribution(keys)` is the whole
  * planner contract: EnsureRequirements inserts the hash exchange —
  * or elides it when the child is already co-partitioned (e.g. read
  * from a bucketed table), which the window rewrite cannot express
  * short of a full sort-based window.
  *
  * The three-piece shape (logical node → strategy → exec) is the
  * standard SparkSessionExtensions operator recipe; the strategy is
  * injected session-wide by [[GraftExtensions]] and per-call through
  * `spark.experimental.extraStrategies` (public API), so the operator
  * works on a vanilla session too.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // the planner contract: co-locate each key's rows; EnsureRequirements
  // adds the exchange only when the child isn't already clustered
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // max-heap under the sort order: head = current worst of the kept
      // k, so admission is one compare and replacement is O(log k)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLocal) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow](ord)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }
}

object TopKPerKey {
  /** Top `k` rows of `df` per `keyCols` group under `orderCols`
    * ((name, ascending) pairs — give a total order for deterministic
    * results). Output schema = input schema.
    */
  def apply(
      df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0 && keyCols.nonEmpty && orderCols.nonEmpty)
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val plan = PlanApi.analyzed(df)
    val resolve = PlanApi.resolver(spark) // honors spark.sql.caseSensitive
    def attr(n: String) = plan.output.filter(a => resolve(a.name, n)) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"no column '$n' in ${plan.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"ambiguous column '$n': ${many.mkString(", ")}")
    }
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    PlanApi.ofRows(spark, TopKPerKeyNode(keyCols.map(attr), order, k, plan))
  }
}
