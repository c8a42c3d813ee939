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
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Distributed Count-Min sketch as an aggregate + estimator pair — the
  * frequency sibling of the [[BloomKernel]] membership pair, and the
  * primitive behind heavy-hitter detection when the exact `GROUP BY
  * token` hash table would be vocabulary-sized: the sketch is
  * `depth × width` longs REGARDLESS of how many distinct keys stream
  * through it.
  *
  * [[CountMinAgg]] builds the sketch as a `TypedImperativeAggregate`:
  * tasks count map-side, partials merge by elementwise ADD (counts are
  * linear, so partials compose at any tree depth), and no partial
  * exceeds `depth·width·8` bytes.  [[CmsEstimate]] reads it as a
  * codegen'd scalar — min over `depth` counters per row, inside
  * whole-stage codegen.
  *
  * CMS never underestimates (one-sided error: estimate ≥ true count,
  * overshoot ≤ εN with ε = e/width at confidence 1−e^(−depth)), so an
  * exact consumer uses it exactly like the Bloom pair: prefilter the
  * stream on `estimate ≥ τ` — every occurrence of a truly-heavy key
  * survives — then run the exact count on the surviving sliver
  * ([[graft.ext.CorpusStats.heavyHitters]]).  Inputs are pre-hashed
  * 64-bit keys (`xxhash64`); rows use the Kirsch–Mitzenmacher
  * construction over the same splitmix64 mix as the Bloom kernel.
  */
object CmsKernel {

  def add(counters: Array[Long], depth: Int, width: Int, v: Long): Unit = {
    val h1 = v
    val h2 = BloomKernel.mix64(v) | 1L
    var i = 0
    while (i < depth) {
      val slot = (((h1 + i * h2) & Long.MaxValue) % width).toInt
      counters(i * width + slot) += 1L
      i += 1
    }
  }

  def estimate(counters: Array[Long], depth: Int, width: Int,
               v: Long): Long = {
    val h1 = v
    val h2 = BloomKernel.mix64(v) | 1L
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val slot = (((h1 + i * h2) & Long.MaxValue) % width).toInt
      val c = counters(i * width + slot)
      if (c < min) min = c
      i += 1
    }
    min
  }

  /** [depth:Int][width:Int][counters…] */
  def serialize(counters: Array[Long], depth: Int, width: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + counters.length * 8)
    bb.putInt(depth).putInt(width)
    counters.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val depth = bb.getInt()
    val width = bb.getInt()
    ((depth, width, Array.fill(depth * width)(bb.getLong())))
  }
}

/** `cms_agg(hash64, depth, width)` → serialized sketch bytes.  Buffer
  * is the raw counter array; merge is elementwise add (linear sketch —
  * partials compose at any tree depth). */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16,
    s"cms_agg needs 1 <= depth <= 16, got $depth")
  require(width >= 16, s"cms_agg needs width >= 16, got $width")
  // fail fast on oversized sketches: beyond 2^26 cells (512 MB) each
  // task would commit GBs of buffer, and depth*width near 2^28 would
  // overflow the Int byte-size arithmetic in CmsKernel.serialize
  require(depth.toLong * width <= CountMinAgg.MaxCells,
    s"cms_agg sketch too large: depth*width = ${depth.toLong * width} " +
      s"exceeds ${CountMinAgg.MaxCells} cells (${CountMinAgg.MaxCells * 8L} B)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_agg expects a pre-hashed BIGINT key (use xxhash64), got " +
        other.catalogString)
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      CmsKernel.add(buffer, depth, width, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    CmsKernel.serialize(buffer, depth, width)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    CmsKernel.serialize(buffer, depth, width)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CmsKernel.deserialize(bytes)._3

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Hard cap on depth×width: 2^26 cells = 512 MB of Long counters —
    * far past any useful CMS (width 2^20 at depth 5 is sub-1% error on
    * a 100 TB vocabulary) and safely below Int-overflow territory in
    * the serialize arithmetic. */
  val MaxCells: Long = 1L << 26

  /** Column-API entry point: aggregate `hash64` keys into sketch bytes. */
  def cmsAgg(hash64: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(hash64), depth, width)
        .toAggregateExpression())
}

/** Frequency estimate against a driver-materialized sketch, shipped as
  * a SPARK BROADCAST rather than a plan literal: the expression (and
  * every serialized task closure with it) carries only the broadcast
  * handle; the counter array moves once per executor over the torrent
  * protocol — at production widths (2²⁰ for sub-1% error on a 100 TB
  * vocabulary ⇒ 32 MB at depth 4) a plan-embedded constant would
  * instead re-serialize into every task binary.  Each row costs
  * `depth` reads + a min inside whole-stage codegen. */
case class CmsEstimate(cms: Broadcast[Array[Long]], depth: Int, width: Int,
                       child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects a pre-hashed BIGINT key, got " +
        other.catalogString)
  }

  override protected def nullSafeEval(v: Any): Any =
    CmsKernel.estimate(cms.value, depth, width, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("cmsBcast", cms,
      "org.apache.spark.broadcast.Broadcast")
    val counters = ctx.freshName("cmsCounters")
    // resolve the broadcast once per generated-class instance, not per row
    ctx.addImmutableStateIfNotExists("long[]", counters,
      c => s"$c = (long[]) $bRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CmsKernel.estimate($counters, $depth, $width, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object CmsEstimate {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Broadcast serialized sketch bytes once; estimates built from the
    * returned handle share the per-executor copy. */
  def broadcastCms(cmsBytes: Array[Byte]): Broadcast[Array[Long]] = {
    val (_, _, counters) = CmsKernel.deserialize(cmsBytes)
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(counters)
  }

  /** Column-API entry point over a pre-broadcast sketch. */
  def cmsEstimate(cms: Broadcast[Array[Long]], depth: Int, width: Int,
                  hash64: Column): Column =
    ColumnBridge.column(CmsEstimate(cms, depth, width,
      ColumnBridge.expression(hash64)))

  /** Column-API entry point from serialized bytes (broadcasts them). */
  def cmsEstimate(cmsBytes: Array[Byte], hash64: Column): Column = {
    val (d, w, _) = CmsKernel.deserialize(cmsBytes)
    cmsEstimate(broadcastCms(cmsBytes), d, w, hash64)
  }
}
