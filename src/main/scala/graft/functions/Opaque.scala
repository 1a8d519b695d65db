package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.DataType

/** Semantically the IDENTITY function, declared non-deterministic — an
  * optimizer barrier for expensive projections (guide §4.4 applied at the
  * expression level): predicate pushdown substitutes a filtered alias's
  * whole expression tree into the predicate, and project-collapse /
  * pushdown can move it below a repartition — both re-evaluate the chain
  * per reference and drag it into the wrong stage. Measured on the
  * curation chain: the 8-regex hygiene projection was substituted into
  * the quality filter three times AND pushed below the spread-the-rows
  * exchange, leaving one task to run every copy. Wrapping the chain in
  * `opaque` pins it where it is written and makes every consumer read the
  * materialized column.
  *
  * The value, null behavior and codegen are the child's, bit for bit —
  * only the `deterministic` flag changes, which results-wise is a no-op
  * (the child IS deterministic).
  */
case class Opaque(child: Expression)
  extends UnaryExpression with UnaryLike[Expression] {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = childGen.code, isNull = childGen.isNull, value = childGen.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)

  override def prettyName: String = "opaque"
}

object Opaque {
  /** Column entry point. */
  def opaque(c: Column): Column = shims.column(Opaque(shims.expression(c)))
}
