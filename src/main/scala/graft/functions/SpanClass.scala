package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.model.SchemaDef

/** The subject class of a document: the text of its first `type`-kind span
  * (`?s a ?class`), or null when untyped — the row-local core of every
  * class-conditional check.
  *
  * A native codegen'd expression because the equivalent HOF chain
  * (`element_at(transform(filter(arrays_zip(...))), 1)`) is
  * CodegenFallback — interpreted per span with three intermediate array
  * allocations — and the class projection runs over the FULL corpus in
  * several check subplans (subject side, target side); this is one tight
  * early-exit loop per row.
  *
  * Children are the `spans.kind` and `spans.text` subfield ARRAYS (not the
  * whole struct column), so Catalyst still prunes the Parquet ReadSchema to
  * exactly those two subfields.
  */
case class SpanClass(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "span_class"

  override def eval(input: InternalRow): Any = {
    val kinds = left.eval(input)
    val texts = right.eval(input)
    if (kinds == null || texts == null) null
    else SpanClass.compute(kinds.asInstanceOf[ArrayData], texts.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val resultCode =
      code"""
         |${l.code}
         |${r.code}
         |boolean ${ev.isNull} = true;
         |UTF8String ${ev.value} = null;
         |if (!${l.isNull} && !${r.isNull}) {
         |  ${ev.value} = graft.functions.SpanClass.compute(${l.value}, ${r.value});
         |  ${ev.isNull} = (${ev.value} == null);
         |}
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanClass =
    copy(left = newLeft, right = newRight)
}

object SpanClass {

  private val TypeKind = UTF8String.fromString(SchemaDef.TypeKind)

  /** Referenced from generated code — must stay public. */
  def compute(kinds: ArrayData, texts: ArrayData): UTF8String = {
    val n = kinds.numElements()
    var i = 0
    while (i < n) {
      if (!kinds.isNullAt(i) && TypeKind.equals(kinds.getUTF8String(i))) {
        return if (i < texts.numElements() && !texts.isNullAt(i)) texts.getUTF8String(i)
        else null
      }
      i += 1
    }
    null
  }

  /** Column entry point over the pruning-friendly subfield arrays. */
  def spanClass(kinds: Column, texts: Column): Column =
    shims.column(SpanClass(shims.expression(kinds), shims.expression(texts)))
}
