package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character n-grams WITH multiplicity as a native codegen'd expression —
  * the gram generator for [[graft.ops.LmQuality]]'s full-corpus passes,
  * where an interpreted `transform(sequence(...))` HOF is the documented
  * repo anti-pattern. Unlike [[graft.ops.Dedup.shingles]] (distinct, for
  * Jaccard), counts matter here, so every occurrence is emitted. Texts
  * shorter than n yield an empty array. Windows advance by CODE POINT —
  * matching Spark's own substring/length semantics and DuckDB's substr in
  * the q_char_bigrams oracle — so astral-plane characters (emoji etc.)
  * are never split into half-surrogate "grams".
  */
case class CharNgrams(child: Expression, n: Int)
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)

  override def prettyName: String = "char_ngrams"
}

object CharNgrams {

  /** Referenced from generated code — must stay public. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // char offset of each code point (offs(cps) = end), so windows slice
    // whole code points — never the middle of a surrogate pair
    val cps = s.codePointCount(0, s.length)
    if (cps < n) return new GenericArrayData(Array.empty[AnyRef])
    val offs = new Array[Int](cps + 1)
    var ci = 0
    var cp = 0
    while (ci < s.length) {
      offs(cp) = ci
      ci += Character.charCount(s.codePointAt(ci))
      cp += 1
    }
    offs(cps) = s.length
    val out = new Array[AnyRef](cps - n + 1)
    var i = 0
    while (i + n <= cps) {
      out(i) = UTF8String.fromString(s.substring(offs(i), offs(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }

  def charNgrams(text: Column, n: Int): Column =
    shims.column(CharNgrams(shims.expression(text), n))
}
