package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH signature of a vector as ONE native codegen'd
  * expression: bit h = sign of the projection onto pseudo-random hyperplane
  * h, whose components derive deterministically from (h, dim) via
  * splitmix64 — every executor regenerates identical planes with no
  * broadcast state, and the signature costs one pass over the vector
  * instead of `bits` interpreted `aggregate(...)` trees.
  */
case class RhpSig(child: Expression, bits: Int)
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rhp_sig requires array<double>, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    RhpSig.compute(input.asInstanceOf[ArrayData].toDoubleArray(), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RhpSig.compute($c.toDoubleArray(), $bits)")

  override protected def withNewChildInternal(newChild: Expression): RhpSig =
    copy(child = newChild)

  override def prettyName: String = "rhp_sig"
}

object RhpSig {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hyperplane component for (plane h, dim d) in [-1, 1). Public: called
    * from generated code and reused by tests.
    */
  def component(h: Int, d: Int): Double =
    (mix(h.toLong * 0x10001L + d) % 1000000L) / 1000000.0

  /** Referenced from generated code — must stay public. */
  def compute(v: Array[Double], bits: Int): Long = {
    var sig = 0L
    var h = 0
    while (h < bits) {
      var proj = 0.0
      var d = 0
      while (d < v.length) { proj += v(d) * component(h, d); d += 1 }
      if (proj >= 0) sig |= (1L << h)
      h += 1
    }
    sig
  }

  /** Column entry point; input must already be array<double>. */
  def rhpSig(c: Column, bits: Int): Column =
    shims.column(RhpSig(shims.expression(c), bits))
}
