package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document code-point histogram signals in ONE native codegen'd pass —
  * the character-level quality family (CCNet/Gopher-style filters threshold
  * on character entropy to drop binary-ish / repetitive-glyph docs):
  *
  *  - `n_chars` / `n_distinct` / `top_count` — exact integers;
  *  - `hist_md5` — md5 of the histogram as sorted `cp:count` pairs joined
  *    by commas: the EXACT cross-engine witness for the whole histogram
  *    (DuckDB reproduces it with unicode() + string_agg ORDER BY), so the
  *    oracle pins every count without shipping the histogram itself;
  *  - `entropy` — Shannon entropy in bits over the code-point
  *    distribution, summed in ASCENDING code-point order (deterministic
  *    under any partitioning; still FP, so the oracle pins the integer
  *    fields + digest and the spec checks entropy against a driver
  *    reference — the q_lm_quality discipline).
  *
  * Counting is by CODE POINT (astral-plane safe), not UTF-16 unit. A
  * distributed explode-chars + groupBy formulation would shuffle the
  * corpus twice for a row-local signal; this is one scan, no shuffle.
  */
case class CharHist(child: Expression)
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType), StructField("n_distinct", LongType),
    StructField("top_count", LongType), StructField("hist_md5", StringType),
    StructField("entropy", DoubleType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CharHist.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharHist.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharHist =
    copy(child = newChild)

  override def prettyName: String = "char_hist"
}

object CharHist {

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Referenced from generated code — must stay public. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    // java.lang.Long values so a missing key is an honest null check, not
    // a scala.Long null-unboxing accident (BoxesRunTime.unboxToLong(null)==0).
    val counts = new java.util.TreeMap[Integer, java.lang.Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.put(cp, counts.getOrDefault(cp, 0L) + 1L)
      n += 1
      i += Character.charCount(cp)
    }
    val sb = new java.lang.StringBuilder()
    var top = 0L
    var ent = 0.0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { // TreeMap: ascending cp — deterministic everywhere
      val e = it.next()
      val c = e.getValue.longValue
      if (sb.length > 0) sb.append(',')
      sb.append(e.getKey.intValue).append(':').append(c)
      if (c > top) top = c
      val p = c.toDouble / n
      ent -= p * math.log(p)
    }
    new GenericInternalRow(Array[Any](
      n, counts.size.toLong, top, UTF8String.fromString(md5Hex(sb.toString)),
      if (n == 0) 0.0 else ent / math.log(2.0)))
  }

  def charHist(text: Column): Column = shims.column(CharHist(shims.expression(text)))
}
