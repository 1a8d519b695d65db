package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized text — a native Catalyst
  * expression with codegen (preference order (b) from the build rules: a
  * custom Expression beats a UDF). Used for near-duplicate detection: texts
  * whose SimHashes differ in ≤ k bits are near-dups.
  *
  * Algorithm: every token contributes its 64-bit hash as ±1 votes per bit
  * position; the sign of each accumulated bit becomes the output bit.
  * Token hash = FNV-1a over the token's UTF-8 bytes (simple, fast, and
  * trivially reproducible in any language for cross-engine parity).
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires a string input, got ${child.dataType.catalogString}")
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** FNV-1a 64-bit. */
  private def fnv1a(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i).toLong & 0xffffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Referenced from generated code — must stay public. */
  def compute(text: String): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) {
        val h = fnv1a(text, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column entry point: `df.select(simhash64($"text"))`. */
  def simhash64(c: Column): Column = shims.column(SimHash64(shims.expression(c)))

  /** Hamming distance between two simhashes as a Column expression. */
  def hammingDist(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
