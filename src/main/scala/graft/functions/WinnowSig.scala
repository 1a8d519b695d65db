package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * polynomial rolling hashes of all character k-grams, then the minimum of
  * every w-hash window (rightmost-min tie break), distinct — the classic
  * rolling-hash fingerprinting scheme for plagiarism/near-dup detection.
  * Guarantees every shared substring of length ≥ k+w-1 contributes at
  * least one shared fingerprint.
  *
  * Native codegen'd expression (one pass per row, monotone-deque window
  * minimum, O(n)); output is the sorted-distinct fingerprint array —
  * explode + bucket-join it for candidate mining ([[graft.ops.Dedup.winnowNearDupPairs]]).
  */
case class WinnowSig(child: Expression, k: Int, w: Int)
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_sig requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowSig.compute(input.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.WinnowSig.compute($c.toString(), $k, $w))")

  override protected def withNewChildInternal(newChild: Expression): WinnowSig =
    copy(child = newChild)
}

object WinnowSig {

  private val Base = 1000003L

  /** Referenced from generated code — must stay public. Returns the
    * sorted-distinct winnowed fingerprint set of `text`.
    */
  def compute(text: String, k: Int, w: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array.emptyLongArray
    val m = n - k + 1 // number of k-gram hashes
    // rolling polynomial hash over chars (mod 2^64)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + text.charAt(i); i += 1 }
    hs(0) = mix(h)
    i = 1
    while (i < m) {
      h = (h - text.charAt(i - 1) * pow) * Base + text.charAt(i + k - 1)
      hs(i) = mix(h)
      i += 1
    }
    if (m <= w) {
      // degenerate: one window — its minimum is the single fingerprint
      var mn = hs(0); i = 1
      while (i < m) { if (hs(i) <= mn) mn = hs(i); i += 1 }
      return Array(mn)
    }
    // monotone deque sliding-window minimum, rightmost-min tie break
    val out = new java.util.TreeSet[java.lang.Long]()
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // [head, tail) holds indices with increasing hash values
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hs(dq(head)))
      i += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    res
  }

  /** splitmix64 finalizer — spreads the weak polynomial bits. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Column entry point: winnowed fingerprint set of a text column. */
  def winnowSig(text: Column, k: Int = 8, w: Int = 8): Column =
    shims.column(WinnowSig(shims.expression(text), k, w))
}
