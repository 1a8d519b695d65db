package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a text as a native codegen'd expression — the
  * gram generator of [[graft.ops.Decontamination]] (full-corpus pass, where
  * the interpreted HOF formulation is the documented repo anti-pattern) and
  * the exact-Jaccard verification stage of `Dedup.ngramJaccardPairs`.
  *
  * Semantics are BIT-IDENTICAL to the Column formulation
  * `array_distinct(transform(sequence(0, greatest(size(toks)-n, 0)), i =>
  * array_join(slice(toks, i+1, n), " ")))` with `toks = split(text, "\s+")`
  * (asserted by PipelineOpsSpec): Java-regex whitespace split with limit -1
  * (leading/trailing empty tokens preserved), documents shorter than n
  * words contribute their whole token sequence as one gram, first-occurrence
  * distinct order.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNgrams {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Referenced from generated code — must stay public. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    // limit -1 matches Spark's split(): trailing empty tokens preserved
    val toks = Ws.split(text.toString, -1)
    val m = toks.length
    // LinkedHashSet for the distinct form (first-occurrence order), plain
    // append order for the multiplicity form — same grams either way
    val out = new java.util.LinkedHashSet[UTF8String]()
    val all = new java.util.ArrayList[UTF8String]()
    val last = math.max(m - n, 0)
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, m)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val g = UTF8String.fromString(sb.toString)
      if (distinct) out.add(g) else all.add(g)
      i += 1
    }
    val arr = if (distinct) out.toArray(new Array[AnyRef](out.size()))
              else all.toArray(new Array[AnyRef](all.size()))
    new GenericArrayData(arr)
  }

  def wordNgrams(text: Column, n: Int): Column =
    shims.column(WordNgrams(shims.expression(text), n))

  /** ALL n-grams with multiplicity (left-to-right order) — the counting
    * twin of [[wordNgrams]] for repetition signals, same tokenization and
    * short-document whole-sequence gram.
    */
  def allWordNgrams(text: Column, n: Int): Column =
    shims.column(WordNgrams(shims.expression(text), n, distinct = false))
}
