package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Removes token spans from a text and reassembles it — the surgical cut
  * step of exact duplicated-passage removal
  * ([[graft.ops.Dedup.passageDedup]]): same idea as the reference fix
  * path's removal of the single offending triple rather than the whole
  * record (`checks/CheckURIExistence.php:408-417`), at passage
  * granularity.
  *
  * `spans` is `array<struct<start:int, fin:int>>` of 0-based token-index
  * ranges, start inclusive / fin exclusive, in ANY order, overlapping
  * freely (the caller feeds raw per-gram windows; the union of positions
  * is what's cut — no pre-merge needed). Output is
  * `struct<text, cut_tokens>` in one of TWO forms:
  *
  *  - `preserveWhitespace = false` (token-rejoin, the parity twin): the
  *    SURVIVING tokens rejoined with single spaces — inter-token
  *    whitespace is not preserved across a cut; documents with no cut
  *    spans should bypass this expression and keep their text verbatim;
  *  - `preserveWhitespace = true` (char-faithful): ONLY the cut tokens'
  *    own characters are removed — every whitespace byte (tabs, runs,
  *    leading/trailing) survives verbatim, so the untouched remainder of
  *    the document is byte-identical to the original. Whitespace residue
  *    remains where a passage was cut (the gap bytes around it), which is
  *    the honest, reversible-audit form for a crawl pipeline.
  *
  * plus the number of tokens removed. Tokenization is the [[ChunkTokens]]
  * ASCII-whitespace scan, identical to [[TokenGramHashes]] so positions
  * line up by construction. Out-of-range span ends are clipped; a
  * fully-cut document yields "" (token form) or its whitespace skeleton
  * (char form).
  */
case class CutTokenSpans(left: Expression, right: Expression,
                         preserveWhitespace: Boolean = false)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("cut_tokens", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StructType(fs), _))
      if fs.length == 2 && fs(0).dataType == IntegerType && fs(1).dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cut_token_spans requires (string, array<struct<int,int>>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def nullSafeEval(text: Any, spans: Any): Any =
    CutTokenSpans.compute(text.asInstanceOf[UTF8String],
      spans.asInstanceOf[ArrayData], preserveWhitespace)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, sp) => s"graft.functions.CutTokenSpans.compute($t, $sp, $preserveWhitespace)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CutTokenSpans =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cut_token_spans"
}

object CutTokenSpans {

  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
      ch == '\f' || ch == '\r'

  /** Referenced from generated code — must stay public. */
  def compute(text: UTF8String, spans: ArrayData,
              preserveWhitespace: Boolean): InternalRow = {
    val s = text.toString
    val len = s.length
    // token boundaries, same scan as TokenGramHashes/ChunkTokens
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isWs(s.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val n = starts.size
    val cut = new Array[Boolean](n)
    val m = spans.numElements()
    var r = 0
    while (r < m) {
      val row = spans.getStruct(r, 2)
      var p = math.max(row.getInt(0), 0)
      val fin = math.min(row.getInt(1), n)
      while (p < fin) { cut(p) = true; p += 1 }
      r += 1
    }
    val sb = new java.lang.StringBuilder(len)
    var nCut = 0
    if (preserveWhitespace) {
      // char-faithful: emit every inter-token gap (and the leading/trailing
      // whitespace) verbatim; skip only the cut tokens' own characters
      var prevEnd = 0
      var t = 0
      while (t < n) {
        sb.append(s, prevEnd, starts.get(t))
        if (cut(t)) nCut += 1
        else sb.append(s, starts.get(t), ends.get(t))
        prevEnd = ends.get(t)
        t += 1
      }
      sb.append(s, prevEnd, len)
    } else {
      var t = 0
      while (t < n) {
        if (cut(t)) nCut += 1
        else {
          if (sb.length > 0) sb.append(' ')
          sb.append(s, starts.get(t), ends.get(t))
        }
        t += 1
      }
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString), nCut))
  }

  def cutTokenSpans(text: Column, spans: Column,
                    preserveWhitespace: Boolean = false): Column =
    shims.column(CutTokenSpans(shims.expression(text), shims.expression(spans),
      preserveWhitespace))
}
