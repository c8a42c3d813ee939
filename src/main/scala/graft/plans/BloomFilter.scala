package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.broadcast.Broadcast

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Distributed Bloom filter as a first-class aggregate + predicate pair
  * — the broadcast-set-membership primitive a 100 TB pipeline needs
  * whenever the "small" side of a semi-join is too big to hash-join
  * cheaply but fits a few MBs of bits (benchmark shingle sets, seen-URL
  * tables, blocklists).
  *
  * [[BloomFilterAgg]] builds the filter as a real
  * `TypedImperativeAggregate`: each task ORs bits map-side, partials
  * merge associatively at any tree depth, and the driver never sees
  * more than `numBits/8` bytes per partial.  [[BloomMightContain]]
  * probes it as a codegen'd scalar predicate over a reference-objected
  * `long[]` — the probe stays inside whole-stage codegen, so a bloom
  * prefilter costs about as much as a comparison per row.
  *
  * Inputs are pre-hashed 64-bit keys (`xxhash64(...)`), kept engine-
  * side so the same column expression feeds build and probe.  Bit
  * positions use double hashing (h1 + i·h2 with a splitmix64-mixed,
  * odd h2) — the standard Kirsch–Mitzenmacher construction.
  *
  * A Bloom filter admits false positives, so exact consumers pair the
  * prefilter with a verifying semi-join on the survivors
  * ([[graft.ext.Dedup.contaminatedDocsBloom]]): the filter culls the
  * corpus-sized stream map-side; the join only ever sees the
  * (tiny) candidate remainder, and the final answer is exact.
  */
object BloomKernel {

  /** splitmix64 finalizer — decorrelates h2 from the raw key. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def set(words: Array[Long], numBits: Int, numHashes: Int, v: Long): Unit = {
    val h1 = v
    val h2 = mix64(v) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  def mightContain(words: Array[Long], numBits: Int, numHashes: Int,
                   v: Long): Boolean = {
    val h1 = v
    val h2 = mix64(v) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** [numBits:Int][numHashes:Int][words…] */
  def serialize(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numBits).putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val numBits = bb.getInt()
    val numHashes = bb.getInt()
    ((numBits, numHashes, Array.fill((numBits + 63) / 64)(bb.getLong())))
  }

  def wordsFor(numBits: Int): Int = (numBits + 63) / 64
}

/** `bloom_agg(hash64, numBits, numHashes)` → serialized filter bytes.
  * Buffer is the raw word array; merge is a word-wise OR (commutative,
  * associative → map-side partials compose at any tree depth). */
case class BloomFilterAgg(child: Expression, numBits: Int, numHashes: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(numBits >= 64, s"bloom_agg needs numBits >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_agg needs 1 <= numHashes <= 16, got $numHashes")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a pre-hashed BIGINT key (use xxhash64), got " +
        other.catalogString)
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomKernel.wordsFor(numBits))

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      BloomKernel.set(buffer, numBits, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    BloomKernel.serialize(buffer, numBits, numHashes)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomKernel.serialize(buffer, numBits, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomKernel.deserialize(bytes)._3

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

object BloomFilterAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point: aggregate `hash64` keys into filter bytes. */
  def bloomAgg(hash64: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomFilterAgg(ColumnBridge.expression(hash64), numBits, numHashes)
        .toAggregateExpression())
}

/** Membership probe against a driver-materialized filter, shipped to
  * executors as a SPARK BROADCAST rather than a plan literal: the
  * expression (and with it every serialized task closure) carries only
  * the broadcast handle; the word array moves once per executor over
  * the torrent protocol and is read via `value()` — at production
  * filter sizes (2²⁴ bits = 2 MB, or far larger) a plan-embedded
  * constant would instead be re-serialized into every task binary.
  * Each row costs `numHashes` masked loads inside whole-stage
  * codegen. */
case class BloomMightContain(bloom: Broadcast[Array[Long]], numBits: Int,
                             numHashes: Int, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a pre-hashed BIGINT key, got " +
        other.catalogString)
  }

  override protected def nullSafeEval(v: Any): Any =
    BloomKernel.mightContain(bloom.value, numBits, numHashes,
      v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloomBcast", bloom,
      "org.apache.spark.broadcast.Broadcast")
    val words = ctx.freshName("bloomWords")
    // resolve the broadcast once per generated-class instance, not per row
    ctx.addImmutableStateIfNotExists("long[]", words,
      w => s"$w = (long[]) $bRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.BloomKernel.mightContain($words, $numBits, $numHashes, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Broadcast serialized filter bytes once; probes built from the
    * returned handle share the per-executor copy. */
  def broadcastBloom(bloomBytes: Array[Byte]): Broadcast[Array[Long]] = {
    val (_, _, words) = BloomKernel.deserialize(bloomBytes)
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(words)
  }

  /** Column-API entry point over a pre-broadcast filter (build once,
    * probe many — e.g. per micro-batch). */
  def bloomMightContain(bloom: Broadcast[Array[Long]], numBits: Int,
                        numHashes: Int, hash64: Column): Column =
    ColumnBridge.column(BloomMightContain(bloom, numBits, numHashes,
      ColumnBridge.expression(hash64)))

  /** Column-API entry point from serialized bytes (broadcasts them). */
  def bloomMightContain(bloomBytes: Array[Byte], hash64: Column): Column = {
    val (m, k, _) = BloomKernel.deserialize(bloomBytes)
    bloomMightContain(broadcastBloom(bloomBytes), m, k, hash64)
  }
}
