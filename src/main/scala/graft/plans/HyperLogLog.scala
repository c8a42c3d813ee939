package graft.plans

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog cardinality sketch — the third sketch family next to
  * Bloom (membership, x35) and Count-Min (frequency, x46): distinct
  * counts in 256 bytes of state per group, no matter how many distinct
  * values flow through.  The 100 TB use: per-source / per-shard
  * vocabulary and distinct-document counts where an exact
  * `count(DISTINCT …)` would build a group-wide hash table and shuffle
  * every distinct value; the sketch shuffles 256 registers per group
  * and merges with elementwise max at any tree depth.
  *
  * Spark ships `approx_count_distinct` (its own HLL++); THIS kernel
  * exists for the same reason the md5 MinHash does: every hash is
  * md5-derived and the whole register computation is defined in
  * hex-digit terms, so the estimate is bit-reproducible across engines
  * and runs — the DuckDB oracle replays registers AND estimate exactly
  * (`substr(md5(v), …)` + the same float expression), which Spark's
  * internal xxhash-based sketch cannot offer.  Determinism is the
  * feature; raw hash throughput is not (md5 ≈ xxhash64/5 — the
  * per-row cost is still far below the shuffle it replaces).
  *
  * Layout (m = 256 buckets, b = 8):
  *  - `h = md5hex(value)` (32 hex chars);
  *  - bucket = int(h[0:2], 16) — first 8 bits;
  *  - rho    = leading-zero BITS of the 48-bit value h[2:14], + 1
  *    (all-zero → 49), computed per hex digit: each leading '0' digit
  *    contributes 4 zeros, the first non-zero digit its own 0-3;
  *  - register[bucket] = max rho;
  *  - estimate = α·m²/Σ 2^−M[j] (α = 0.7213/(1+1.079/m)), with the
  *    standard linear-counting fallback E ≤ 2.5m ∧ V > 0 → m·ln(m/V).
  *    Σ runs in bucket order 0..255 on both engines, and 2^−r is exact
  *    in a double, so the rounding sequence is identical.
  *
  * Standard error ≈ 1.04/√m ≈ 6.5% at m = 256 — the per-group state is
  * deliberately tiny; raise `b` in a fork if a tighter bound matters
  * more than the 256-byte partials.
  */
object HllKernel {
  val b = 8
  val m: Int = 1 << b // 256 registers
  val alpha: Double = 0.7213 / (1 + 1.079 / m)

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** (bucket, rho) of one value — defined in hex-digit terms so the
    * DuckDB oracle mirrors it with substr(md5(v), …). */
  def bucketRho(value: Array[Byte]): (Int, Int) = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(value)
    val bucket = h(0) & 0xff // = int of hex chars 1..2
    // hex chars 3..14 = bytes 1..6 (12 hex digits, 48 bits)
    var rho = 1
    var i = 1
    var done = false
    while (i <= 6 && !done) {
      val byte = h(i) & 0xff
      val hi = byte >>> 4
      val lo = byte & 0xf
      if (hi == 0) rho += 4
      else { rho += Integer.numberOfLeadingZeros(hi) - 28; done = true }
      if (!done) {
        if (lo == 0) rho += 4
        else { rho += Integer.numberOfLeadingZeros(lo) - 28; done = true }
      }
      i += 1
    }
    (bucket, rho)
  }

  def add(regs: Array[Long], value: Array[Byte]): Unit = {
    val (bucket, rho) = bucketRho(value)
    if (rho > regs(bucket)) regs(bucket) = rho
  }

  /** The estimate, with Σ in bucket order (oracle-identical). */
  def estimate(regs: Array[Long]): Double = {
    var sum = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      sum += math.pow(2.0, -regs(j).toDouble)
      if (regs(j) == 0L) zeros += 1
      j += 1
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  def serialize(regs: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(regs.length)
    regs.foreach(r => bb.put(r.toByte)) // rho <= 49 fits a byte
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] =
    bytes.map(_.toLong & 0xffL)

  /** The serialized sketch of a single value — [[HllSingleton]]'s
    * kernel (one register set, one store). */
  def singleton(value: Array[Byte]): Array[Byte] = {
    val regs = new Array[Long](m)
    add(regs, value)
    serialize(regs)
  }
}

/** `hll_agg(value)` → estimated distinct count (DOUBLE, rounded by the
  * caller).  Buffer = 256 registers; merge = elementwise max (idempotent
  * + commutative + associative — partials compose at any tree depth,
  * and re-adding a value never changes state). */
case class HllAgg(child: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_agg expects STRING or BIGINT values, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](HllKernel.m)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v match {
        case s: UTF8String => s.getBytes
        case l: java.lang.Long =>
          l.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      }
      HllKernel.add(buffer, bytes)
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = HllKernel.estimate(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    HllKernel.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    HllKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
}

object HllAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point: estimated distinct count of `value`. */
  def hllAgg(value: Column): Column =
    ColumnBridge.column(
      HllAgg(ColumnBridge.expression(value)).toAggregateExpression())
}

/** `hll_singleton(value)` → the 256-byte register sketch of ONE value —
  * the seed of sketch-valued computations ([[HllUnionAgg]] merges
  * them, [[HllEst]] reads them out).  The HyperBall seed: every node
  * starts as the sketch of itself. */
case class HllSingleton(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.BinaryType

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_singleton expects STRING or BIGINT values, got " +
        s"${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case s: UTF8String => s.getBytes
      case l: java.lang.Long =>
        l.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    HllKernel.singleton(bytes)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kernel = HllKernel.getClass.getName.stripSuffix("$")
    val conv =
      if (child.dataType == StringType) (s: String) => s"$s.getBytes()"
      else (s: String) =>
        s"java.lang.Long.toString($s).getBytes(" +
          "java.nio.charset.StandardCharsets.UTF_8)"
    defineCodeGen(ctx, ev, c => s"$kernel.singleton(${conv(c)})")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HllSingleton = copy(child = newChild)
}

object HllSingleton {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def hllSingleton(value: Column): Column =
    ColumnBridge.column(HllSingleton(ColumnBridge.expression(value)))
}

/** `hll_union(sketch)` → merged 256-byte sketch: elementwise register
  * max (idempotent + commutative + associative — partials compose at
  * any tree depth, so the union agg is map-side combinable like every
  * sketch in the family).  NULL sketches are ignored; malformed
  * lengths throw at the boundary rather than corrupting registers. */
case class HllUnionAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {
  import org.apache.spark.sql.types.BinaryType

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_union expects BINARY sketches, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](HllKernel.m)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      require(bytes.length == HllKernel.m,
        s"hll_union got a ${bytes.length}-byte value; expected a " +
          s"${HllKernel.m}-byte graft HLL sketch")
      var i = 0
      while (i < buffer.length) {
        val r = bytes(i).toLong & 0xffL
        if (r > buffer(i)) buffer(i) = r
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = HllKernel.serialize(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    HllKernel.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    HllKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): HllUnionAgg = copy(child = newChild)
}

object HllUnionAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def hllUnion(sketch: Column): Column =
    ColumnBridge.column(
      HllUnionAgg(ColumnBridge.expression(sketch)).toAggregateExpression())
}

/** `hll_est(sketch)` → the sketch's cardinality estimate — the same
  * bucket-ordered Σ and linear-counting fallback as [[HllAgg]], read
  * off a materialized sketch column. */
case class HllEst(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.BinaryType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_est expects BINARY sketches, got ${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    HllKernel.estimate(HllKernel.deserialize(v.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kernel = HllKernel.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev,
      c => s"$kernel.estimate($kernel.deserialize($c))")
  }

  override protected def withNewChildInternal(newChild: Expression): HllEst =
    copy(child = newChild)
}

object HllEst {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def hllEst(sketch: Column): Column =
    ColumnBridge.column(HllEst(ColumnBridge.expression(sketch)))
}
