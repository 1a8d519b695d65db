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
import graft.model.SchemaDef

/** The composed validation pass's per-doc projections — subject class,
  * type-class texts, (kind, media_ref) reference pairs — computed in ONE
  * native walk over the spans array.
  *
  * Why: the shared-scan build previously computed `__typeClasses` and
  * `__refs` through `transform(filter(arrays_zip(...)))` chains, which are
  * CodegenFallback — interpreted per span with intermediate array
  * allocations — and the build stage is the composed pass's single
  * hottest stage (measured ~32 CPU-s at 800k docs, a large slice of it
  * these two projections). Semantics replicated EXACTLY (the per-check
  * HOF forms remain in CheckContext for the unshared plans, and
  * SharedScanParitySpec pins equality):
  *
  *  - `cls`: text of the FIRST `type`-kind span, null when untyped or the
  *    text is null ([[SpanClass.compute]] verbatim);
  *  - `typeClasses`: texts (nulls preserved) of ALL `type`-kind spans —
  *    `transform(filter(zip(kind, text), kind === type), text)`;
  *  - `refs`: (kind, media_ref) of spans with non-null media_ref (kind
  *    may be null) — `filter(zip(kind, media_ref), media_ref.isNotNull)`;
  *  - NULL spans array → all three null, like the HOF chains.
  */
case class SpanProjections(child: Expression, arity: Int)
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = SpanProjections.OutType

  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else SpanProjections.compute(v.asInstanceOf[ArrayData], arity)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SpanProjections.compute($c, $arity)")

  override protected def withNewChildInternal(newChild: Expression): SpanProjections =
    copy(child = newChild)

  override def prettyName: String = "span_projections"
}

object SpanProjections {

  val OutType: DataType = StructType(Seq(
    StructField("cls", StringType),
    StructField("typeClasses", ArrayType(StringType, containsNull = true)),
    StructField("refs", ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("media_ref", StringType))), containsNull = false))))

  private val TypeKind = UTF8String.fromString(SchemaDef.TypeKind)

  /** Referenced from generated code — must stay public. */
  def compute(spans: ArrayData, arity: Int): InternalRow = {
    val n = spans.numElements()
    var cls: UTF8String = null
    var seenType = false
    val typeClasses = new java.util.ArrayList[AnyRef](2)
    val refs = new java.util.ArrayList[AnyRef](4)
    var i = 0
    while (i < n) {
      if (!spans.isNullAt(i)) {
        val s = spans.getStruct(i, arity)
        val kind = if (s.isNullAt(0)) null else s.getUTF8String(0)
        if (kind != null && TypeKind.equals(kind)) {
          val text = if (s.isNullAt(1)) null else s.getUTF8String(1)
          typeClasses.add(text)
          if (!seenType) { seenType = true; cls = text }
        }
        if (!s.isNullAt(2)) {
          refs.add(InternalRow(kind, s.getUTF8String(2)))
        }
      }
      i += 1
    }
    InternalRow(cls,
      new GenericArrayData(typeClasses.toArray),
      new GenericArrayData(refs.toArray))
  }

  /** Column entry point over the whole spans column. */
  def spanProjections(spans: Column, arity: Int): Column =
    shims.column(SpanProjections(shims.expression(spans), arity))
}
