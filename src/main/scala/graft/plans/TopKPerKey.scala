package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Per-key top-k as a WHOLE-OPERATOR extension — the (c) tier of the
  * extension ladder: a custom LogicalPlan node, a SparkStrategy, and a
  * physical SparkPlan, registered through SparkSessionExtensions
  * (`injectPlannerStrategy`).  The other tiers are already covered by
  * the kernel expressions (MinHashSig &c.) and the
  * [[PushNanosEquivFilter]] optimizer rule.
  *
  * WHY a physical operator: the declarative form —
  * `row_number() OVER (PARTITION BY k ORDER BY o) <= k` + filter —
  * plans a WindowExec, which SORTS EVERY GROUP COMPLETELY (spilling
  * corpus-sized runs at scale) only to discard all but k rows per
  * group.  This operator keeps a k-BOUNDED binary heap per key inside
  * each post-shuffle partition: memory is O(#keys·k·rowSize) instead
  * of the sort's O(partition), nothing spills, and rows beyond the
  * heap bound are rejected with ONE comparison against the heap root.
  * Same rows out (the ordering must be total — pass a unique tiebreak
  * column, exactly as the window form needs for determinism).
  *
  * Physical contract: `requiredChildDistribution` =
  * ClusteredDistribution(keys) — Spark inserts the hash exchange (and
  * AQE still manages it); within each partition a generated ordering
  * (`LazilyGeneratedOrdering`) compares rows; output is each key's k
  * minimal rows under the ordering, emitted in heap-drain order
  * (per-group order is NOT part of the contract, matching the
  * window+filter form after its filter).
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
                      k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"topKPerKey needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans the logical node; everything else falls through. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val keysLocal = keys
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val ord = new LazilyGeneratedOrdering(orderLocal, childOutput)
      val toUnsafe = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(childOutput, childOutput)
      val keyProj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(keysLocal, childOutput)
      // per key: a max-heap under `ord` (root = worst retained row) so
      // admission tests are one comparison and eviction is O(log k)
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[UnsafeRow]]()
      while (it.hasNext) {
        val row = toUnsafe(it.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](
            kLocal, ord.reverse.asInstanceOf[java.util.Comparator[UnsafeRow]])
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {

  /** The k smallest rows per key under `order` (ascending `asc` /
    * descending `desc` Columns accepted; pass a unique tiebreak last —
    * same determinism contract as `row_number`). */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    // eager conversion: inside a custom node the analyzer resolves real
    // UnresolvedAttribute trees but never forces the lazy column wrapper
    val keyExprs = keys.map(ColumnBridge.eagerExpression)
    val sortOrder = order.map(c => ColumnBridge.eagerExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKey(keyExprs, sortOrder, k, child))
  }
}
