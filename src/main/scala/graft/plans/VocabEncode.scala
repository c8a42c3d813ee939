package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real-vocabulary tokenization as a single narrow kernel: greedy
  * longest-match (maximal-munch / WordPiece-style) encode of a text
  * against a FIXED vocabulary, returning the token-id array — the
  * operator that turns every token-denominated number in the engine
  * (budgets, mixtures, curriculum) from "regex-token count" into
  * "count under the deployment's actual vocab".
  *
  * Semantics: scan left to right; a space is a hard boundary (consumed,
  * never part of a token — vocab entries must not contain spaces); at
  * each position take the LONGEST vocab entry matching at that
  * position (ties impossible — entries are distinct); if none matches,
  * consume one character as UNK (id −1).  Greedy longest-match is the
  * deterministic, rank-free apply step of a trained subword vocab: the
  * merges table's rank order matters during TRAINING, but applying a
  * frozen vocab greedily is the standard WordPiece inference rule, and
  * it is exactly replayable by the DuckDB oracle (recursive CTE over
  * the same vocab literal).
  *
  * Scale shape: the vocab ships inside the expression (serialized once
  * per task, like a broadcast dim — a 50 k-entry vocab is ~1 MB); the
  * trie builds once per executor ([[VocabTrie]] is `@transient lazy`),
  * and each document row is one O(chars) kernel call with O(1)
  * per-char trie steps — scan → project, no explode, no shuffle, no
  * UDF.  Codegen keeps whole-stage compilation intact via a referenced
  * kernel object (the regexp-expression pattern).
  *
  * SQL form: `vocab_encode(text, array('a','b','ab', …))` — arg 2 must
  * be a foldable array<string> literal. */
case class VocabEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "vocab must not be empty")
  require(vocab.forall(t => t.nonEmpty && !t.contains(' ')),
    "vocab entries must be non-empty and space-free")
  require(vocab.distinct.size == vocab.size, "vocab entries must be distinct")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vocab_encode expects a string, got ${other.catalogString}")
  }

  @transient private lazy val trie: VocabTrie = VocabTrie.build(vocab)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else trie.encode(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val trieRef = ctx.addReferenceObj("vocabTrie", trie,
      classOf[VocabTrie].getName)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $trieRef.encode(${childGen.value});
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): VocabEncode =
    copy(child = newChild)
}

object VocabEncode {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point. */
  def vocabEncode(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(VocabEncode(ColumnBridge.expression(text), vocab))
}

/** Immutable char-trie behind [[VocabEncode]]: id = index of the entry
  * in the vocab seq; terminal nodes carry it, inner nodes carry −1. */
final class VocabTrie private (root: VocabTrie.Node) extends Serializable {

  /** Greedy longest-match encode; spaces are consumed boundaries,
    * unmatched characters emit UNK (−1) and advance one char. */
  def encode(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[Integer](math.max(8, str.length / 4))
    var i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') i += 1
      else {
        var node = root
        var j = i
        var bestId = -1
        var bestEnd = i
        var live = true
        while (live && j < str.length) {
          val nx = node.child(str.charAt(j))
          if (nx == null) live = false
          else {
            node = nx; j += 1
            if (node.id >= 0) { bestId = node.id; bestEnd = j }
          }
        }
        if (bestId >= 0) { out.add(bestId); i = bestEnd }
        else { out.add(-1); i += 1 }
      }
    }
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k).intValue(); k += 1 }
    ArrayData.toArrayData(arr)
  }
}

object VocabTrie {
  /** Trie node: children in a sorted parallel array (vocab alphabets
    * are small; binary search beats per-node hash maps on memory and
    * build cost, and lookups are O(log fanout)). */
  final class Node extends Serializable {
    var id: Int = -1
    var chars: Array[Char] = Array.empty
    var kids: Array[Node] = Array.empty

    def child(c: Char): Node = {
      val idx = java.util.Arrays.binarySearch(chars, c)
      if (idx >= 0) kids(idx) else null
    }

    private[VocabTrie] def getOrAdd(c: Char): Node = {
      val idx = java.util.Arrays.binarySearch(chars, c)
      if (idx >= 0) kids(idx)
      else {
        val at = -idx - 1
        val n = new Node
        val nc = new Array[Char](chars.length + 1)
        val nk = new Array[Node](kids.length + 1)
        System.arraycopy(chars, 0, nc, 0, at)
        System.arraycopy(kids, 0, nk, 0, at)
        nc(at) = c; nk(at) = n
        System.arraycopy(chars, at, nc, at + 1, chars.length - at)
        System.arraycopy(kids, at, nk, at + 1, kids.length - at)
        chars = nc; kids = nk
        n
      }
    }
  }

  def build(vocab: Seq[String]): VocabTrie = {
    val root = new Node
    vocab.zipWithIndex.foreach { case (tok, id) =>
      var node = root
      tok.foreach(c => node = node.getOrAdd(c))
      node.id = id
    }
    new VocabTrie(root)
  }
}
