package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, LongType}

/** In-partition prefix sum as a whole-operator extension — the
  * round-20 optimization twin of `globalRank`'s
  * monotonically_increasing_id decode, for the cumulative-sum half of
  * the family (`CorpusStats.globalCumSum`: x59 budget metering, x98
  * occupancy sweep-line, packing offsets).
  *
  * WHY a physical operator: the prefix accumulator is per-row STATE, so
  * there is no built-in whole-stage expression for it — the previous
  * implementation was `Dataset.mapPartitions` over external Rows, which
  * de/serializes EVERY row and column across the InternalRow↔Row
  * encoder boundary just to append three scratch columns.  This
  * operator does the same walk directly over InternalRows: one bound
  * expression eval per row, one UnsafeProjection append, zero encoder
  * round-trips, and the child's partitioning/ordering are preserved
  * (no exchange is required or introduced — at any scale this is a
  * narrow pipelined pass, exactly like the Row version).
  *
  * Contract (unchanged from the mapPartitions form): appends
  * `__pid` (partition id), `__pcum` (running sum of `value` in child
  * iteration order, summed as long), `__ridx` (1-based in-partition row
  * index).  `value` must be integral; overflow follows Java long
  * arithmetic exactly as the Row version's `Number.longValue()` sum
  * did.  ExtSpec pins strategy equivalence against the Row path.
  */
case class PartitionPrefixSum(value: Expression,
                              pidAttr: Attribute, pcumAttr: Attribute,
                              ridxAttr: Attribute,
                              child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] =
    child.output ++ Seq(pidAttr, pcumAttr, ridxAttr)
  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(pidAttr, pcumAttr, ridxAttr))
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): PartitionPrefixSum = copy(child = newChild)
}

object PartitionPrefixSumStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PartitionPrefixSum(value, pid, pcum, ridx, child) =>
      PartitionPrefixSumExec(value, pid, pcum, ridx,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

case class PartitionPrefixSumExec(value: Expression,
                                  pidAttr: Attribute, pcumAttr: Attribute,
                                  ridxAttr: Attribute,
                                  child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] =
    child.output ++ Seq(pidAttr, pcumAttr, ridxAttr)
  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(pidAttr, pcumAttr, ridxAttr))
  // a narrow per-partition pass: partitioning and ordering survive
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val valueLocal = value
    val types = output.map(_.dataType)
    child.execute().mapPartitions({ it =>
      val bound = BindReferences.bindReference(valueLocal, childOutput)
      val extras = new GenericInternalRow(3)
      extras.update(0, org.apache.spark.TaskContext.getPartitionId())
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(types.toArray)
      var acc = 0L
      var ridx = 0L
      it.map { row =>
        acc += bound.eval(row).asInstanceOf[Number].longValue()
        ridx += 1L
        extras.update(1, acc)
        extras.update(2, ridx)
        toUnsafe(joined(row, extras))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): PartitionPrefixSumExec = copy(child = newChild)
}

object PartitionPrefixSum {

  /** Append (__pid, __pcum, __ridx) per partition — running sum of
    * `valueCol` and 1-based row index, both in the frame's current
    * per-partition order (establish it first: repartitionByRange +
    * sortWithinPartitions, exactly as `globalCumSum` does). */
  def attach(df: DataFrame, valueCol: String): DataFrame = {
    val child = df.queryExecution.analyzed
    val value = child.output.find(_.name == valueCol).getOrElse(
      throw new IllegalArgumentException(
        s"partitionPrefixSum: no column $valueCol in " +
          child.output.map(_.name).mkString(", ")))
    require(value.dataType == LongType || value.dataType == IntegerType ||
      value.dataType.isInstanceOf[org.apache.spark.sql.types.ShortType] ||
      value.dataType.isInstanceOf[org.apache.spark.sql.types.ByteType],
      s"partitionPrefixSum sums integral columns (got ${value.dataType})")
    ColumnBridge.ofRows(df.sparkSession,
      PartitionPrefixSum(value,
        AttributeReference("__pid", IntegerType, nullable = false)(),
        AttributeReference("__pcum", LongType, nullable = false)(),
        AttributeReference("__ridx", LongType, nullable = false)(),
        child))
  }
}
