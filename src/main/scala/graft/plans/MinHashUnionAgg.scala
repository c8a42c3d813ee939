package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Elementwise-minimum aggregate over MinHash signature arrays — the
  * signature-union property made into a real `TypedImperativeAggregate`
  * (the custom-UDAF extension point of SURVEY §2.10/§7.3).
  *
  * MinHash lane i of a set union is `min(lane_i(A), lane_i(B))`, so
  * aggregating member signatures with an elementwise min yields the
  * exact signature OF THE UNION of the members' shingle sets — no
  * re-tokenization, no second corpus pass.  That makes cluster-level
  * signatures (near-dup cluster ≈ its union sketch), incremental
  * corpus sketches (partition-wise partials merged at any tree depth),
  * and batch-over-batch index maintenance all one aggregation.
  *
  * The operation is commutative and associative, so partial
  * aggregation (map-side combine) applies and results are independent
  * of row order and partitioning — the property the DuckDB oracle
  * relies on to replay it as per-lane `min()`.
  *
  * Buffer: the running per-lane minima as raw byte arrays (hex chunks
  * compare bytewise identically to the UTF8String binary order used
  * by column-level `min`).  An empty buffer (no input yet) evaluates
  * to NULL, matching built-in aggregate null semantics.
  */
case class MinHashUnionAgg(child: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Array[Byte]]]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_union expects array<string> signatures, got " +
        other.catalogString)
  }

  override def createAggregationBuffer(): Array[Array[Byte]] =
    Array.empty[Array[Byte]]

  override def update(buffer: Array[Array[Byte]],
                      input: InternalRow): Array[Array[Byte]] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val k = arr.numElements()
    if (buffer.isEmpty) {
      val fresh = new Array[Array[Byte]](k)
      var i = 0
      while (i < k) { fresh(i) = laneBytes(arr, i); i += 1 }
      fresh
    } else {
      require(buffer.length == k,
        s"minhash_union: mixed signature widths (${buffer.length} vs $k)")
      var i = 0
      while (i < k) {
        val b = laneBytes(arr, i)
        if (compareBytes(b, buffer(i)) < 0) buffer(i) = b
        i += 1
      }
      buffer
    }
  }

  // checkInputDataTypes accepts containsNull=true arrays (Spark marks
  // most constructed arrays nullable regardless of content), so a null
  // LANE must fail with a clear message, not an NPE inside the task
  private def laneBytes(arr: ArrayData, i: Int): Array[Byte] = {
    if (arr.isNullAt(i)) throw new IllegalArgumentException(
      s"minhash_union: signature lane $i is NULL — signatures must be " +
        "complete arrays of hex chunks")
    arr.getUTF8String(i).getBytes
  }

  override def merge(buffer: Array[Array[Byte]],
                     other: Array[Array[Byte]]): Array[Array[Byte]] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other
    require(buffer.length == other.length,
      s"minhash_union: mixed signature widths (${buffer.length} vs " +
        s"${other.length})")
    var i = 0
    while (i < buffer.length) {
      if (compareBytes(other(i), buffer(i)) < 0) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Array[Byte]]): Any =
    if (buffer.isEmpty) null
    else new GenericArrayData(
      buffer.map(b => UTF8String.fromBytes(b): AnyRef))

  override def serialize(buffer: Array[Array[Byte]]): Array[Byte] = {
    val size = 4 + buffer.map(4 + _.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buffer.length)
    buffer.foreach { lane => bb.putInt(lane.length); bb.put(lane) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt()
    Array.fill(k) {
      val lane = new Array[Byte](bb.getInt())
      bb.get(lane)
      lane
    }
  }

  // unsigned bytewise order == UTF8String binary order
  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashUnionAgg =
    copy(child = newChild)
}

object MinHashUnionAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point: `minhashUnion(sigCol)` as an aggregate. */
  def minhashUnion(sig: Column): Column =
    ColumnBridge.column(
      MinHashUnionAgg(ColumnBridge.expression(sig)).toAggregateExpression())
}
