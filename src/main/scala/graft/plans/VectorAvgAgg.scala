package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Elementwise mean over fixed-width double vectors — the centroid
  * update of Lloyd's k-means, as a `TypedImperativeAggregate`.
  *
  * The alternative DataFrame formulation (posexplode to (id, pos,
  * component) then a (cell, pos) grouped avg) multiplies the shuffled
  * row count by the dimensionality; this aggregate keeps one running
  * (sums[dim], count) buffer per group with map-side partial
  * aggregation, so the exchange carries one row per (group,
  * partition).
  *
  * Floating-point note: summation order depends on partitioning, so
  * results are deterministic only up to FP associativity — fine for
  * index TRAINING ([[graft.ext.Similarity.ivfIndexRefined]]), where
  * centroids steer recall, not correctness: probe results are exact
  * re-ranks regardless of the codebook.  Anything oracle-checked must
  * not depend on this aggregate. */
case class VectorAvgAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_avg expects array<double>, got ${other.catalogString}")
  }

  // buffer layout: [count, sum_0 … sum_{dim-1}]; empty = no input yet
  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(buffer: Array[Double],
                      input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val b = if (buffer.isEmpty) new Array[Double](dim + 1) else buffer
    require(b.length == dim + 1,
      s"vector_avg: mixed dimensionality (${b.length - 1} vs $dim)")
    b(0) += 1.0
    var i = 0
    while (i < dim) { b(i + 1) += arr.getDouble(i); i += 1 }
    b
  }

  override def merge(buffer: Array[Double],
                     other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other
    require(buffer.length == other.length,
      s"vector_avg: mixed dimensionality (${buffer.length - 1} vs " +
        s"${other.length - 1})")
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null
    else {
      val n = buffer(0)
      val out = new Array[Any](buffer.length - 1)
      var i = 1
      while (i < buffer.length) { out(i - 1) = buffer(i) / n; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.length * 8)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt())(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorAvgAgg =
    copy(child = newChild)
}

object VectorAvgAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point: `vectorAvg(vecCol)` as an aggregate. */
  def vectorAvg(vec: Column): Column =
    ColumnBridge.column(
      VectorAvgAgg(ColumnBridge.expression(vec)).toAggregateExpression())
}
