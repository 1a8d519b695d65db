package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All k-token-gram hashes of a text with their 0-based token positions —
  * the position-aware gram generator for exact duplicated-PASSAGE removal
  * ([[graft.ops.Dedup.passageDedup]]). [[WordNgrams]] emits gram STRINGS
  * (set semantics, for Jaccard); this emits one `struct<hash, pos>` per
  * gram START so the caller can map duplicated grams back to the exact
  * token span they cover and cut it.
  *
  * Native codegen'd expression, one pass per row: tokenize on ASCII
  * whitespace runs (the [[ChunkTokens]] scan — leading/trailing whitespace
  * ignored, surrogate-safe), hash each token (polynomial over chars +
  * splitmix finalizer, the [[WinnowSig]] recipe), then each gram hash is a
  * polynomial over its k token hashes, finalized again. 64-bit hashes:
  * cross-gram collision probability at 10^9 grams is ~3e-2 corpus-wide
  * and ~0 per pair — and a collision only ever cuts one extra k-token
  * window, never corrupts unrelated text.
  *
  * Documents with fewer than k tokens emit NO grams (a short doc is never
  * "a duplicated passage of itself" — deliberately unlike [[WordNgrams]]'
  * whole-sequence short-doc gram, which serves containment estimates).
  */
case class TokenGramHashes(child: Expression, k: Int)
  extends UnaryExpression with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("hash", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_gram_hashes requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TokenGramHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenGramHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TokenGramHashes =
    copy(child = newChild)

  override def prettyName: String = "token_gram_hashes"
}

object TokenGramHashes {

  private val Base = 1000003L

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
      ch == '\f' || ch == '\r'

  /** Referenced from generated code — must stay public. */
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val s = text.toString
    val len = s.length
    // per-token hashes in one scan (offsets are not emitted: the cut step
    // re-walks the same tokenization in CutTokenSpans, keeping this
    // expression's output rows small for the explode)
    val tokHs = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        var h = 0L
        while (i < len && !isWs(s.charAt(i))) { h = h * Base + s.charAt(i); i += 1 }
        tokHs.add(mix(h))
      }
    }
    val n = tokHs.size
    if (n < k) return new GenericArrayData(Array.empty[AnyRef])
    val m = n - k + 1
    val out = new Array[AnyRef](m)
    var g = 0
    while (g < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * Base + tokHs.get(g + j); j += 1 }
      out(g) = new GenericInternalRow(Array[Any](mix(h), g))
      g += 1
    }
    new GenericArrayData(out)
  }

  def tokenGramHashes(text: Column, k: Int): Column =
    shims.column(TokenGramHashes(shims.expression(text), k))
}
