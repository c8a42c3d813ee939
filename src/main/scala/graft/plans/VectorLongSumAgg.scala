package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Elementwise EXACT sum over fixed-width long vectors — the integer
  * twin of [[VectorAvgAgg]], for centroid updates that must replay
  * bit-identically in a SQL oracle.
  *
  * [[VectorAvgAgg]]'s double sums are deterministic only up to FP
  * associativity, so anything oracle-checked cannot use it (its own
  * scaladoc contract).  Summing dyadic-quantized components as longs
  * instead is exact and order-independent — the
  * [[graft.ext.QualityModel]] dyadic-grid discipline applied to
  * vectors — which is what lets [[graft.ext.Clustering.kmeans]] expose
  * Lloyd's k-means as an oracle-green query rather than a
  * recall-only index-training detail.
  *
  * Same shuffle shape as VectorAvgAgg: one (sums[dim]) buffer per
  * group with map-side partial aggregation — never the posexplode
  * formulation, which would multiply the exchanged row count by the
  * dimensionality.  Overflow fails loudly (`Math.addExact`): at the
  * 2^20 grid a unit-scale component sums exactly past 2^32 rows per
  * group before the guard can trip. */
case class VectorLongSumAgg(child: Expression,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_long_sum expects array<bigint>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.empty

  override def update(buffer: Array[Long],
                      input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val b = if (buffer.isEmpty) new Array[Long](dim) else buffer
    require(b.length == dim,
      s"vector_long_sum: mixed dimensionality (${b.length} vs $dim)")
    var i = 0
    while (i < dim) { b(i) = Math.addExact(b(i), arr.getLong(i)); i += 1 }
    b
  }

  override def merge(buffer: Array[Long],
                     other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other
    require(buffer.length == other.length,
      s"vector_long_sum: mixed dimensionality (${buffer.length} vs " +
        s"${other.length})")
    var i = 0
    while (i < buffer.length) {
      buffer(i) = Math.addExact(buffer(i), other(i)); i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null
    else new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.length * 8)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt())(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorLongSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorLongSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorLongSumAgg =
    copy(child = newChild)
}

object VectorLongSumAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point: `vectorLongSum(vecCol)` as an aggregate. */
  def vectorLongSum(vec: Column): Column =
    ColumnBridge.column(
      VectorLongSumAgg(ColumnBridge.expression(vec)).toAggregateExpression())
}
