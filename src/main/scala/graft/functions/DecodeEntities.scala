package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Extended HTML entity decode — ONE left-to-right scan, native codegen'd
  * (the [[ChunkTokens]] discipline: a regexp_replace chain re-scans the
  * string once per entity, ~50 passes per row at corpus scale; this is one
  * pass total). Decodes:
  *  - the named entities in [[DecodeEntities.Named]] (strict `&name;`
  *    form — the semicolon-less HTML legacy forms are intentionally NOT
  *    recognized: `&ampersand` prose would corrupt);
  *  - numeric character references, decimal `&#NNN;` and hex `&#xHH;`,
  *    for valid non-control, non-surrogate code points (cp ≥ 0x20).
  *
  * Anything unrecognized — unknown names, invalid/control/surrogate code
  * points, bodies longer than [[DecodeEntities.MaxBody]] — passes through
  * UNCHANGED: a curation decode must never destroy bytes it doesn't
  * understand. Decoding is single-pass and NON-recursive: `&amp;lt;`
  * yields the literal text `&lt;` (double-escaped content stays escaped),
  * the same semantics as [[graft.ops.TextAnalysis.stripMarkup]]'s
  * amp-last chain.
  */
case class DecodeEntities(child: Expression)
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    DecodeEntities.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DecodeEntities.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DecodeEntities =
    copy(child = newChild)

  override def prettyName: String = "decode_entities"
}

object DecodeEntities {

  /** Longest entity body recognized (`frac12` is 6; hex refs rarely exceed
    * 8) — a `;` further away than this is prose punctuation, not an entity.
    */
  val MaxBody = 10

  /** Named entities (name → code point), the common-web-text subset of the
    * HTML table: XML's five, typography (dashes, ellipsis, curly quotes),
    * symbols (©®™°·•«»±×÷§¶†′½²³), currencies, and the frequent Latin-1
    * letters. `nbsp` decodes to the REAL U+00A0 (downstream whitespace
    * collapse owns the space policy). Exposed so the cross-engine oracle
    * renders its DuckDB mirror from this same table.
    */
  val Named: Seq[(String, Int)] = Seq(
    "lt" -> 60, "gt" -> 62, "quot" -> 34, "apos" -> 39,
    "nbsp" -> 160, "copy" -> 169, "reg" -> 174, "trade" -> 8482,
    "deg" -> 176, "middot" -> 183, "bull" -> 8226,
    "laquo" -> 171, "raquo" -> 187, "plusmn" -> 177,
    "times" -> 215, "divide" -> 247, "sect" -> 167, "para" -> 182,
    "pound" -> 163, "euro" -> 8364, "yen" -> 165, "cent" -> 162,
    "mdash" -> 8212, "ndash" -> 8211, "hellip" -> 8230,
    "lsquo" -> 8216, "rsquo" -> 8217, "ldquo" -> 8220, "rdquo" -> 8221,
    "dagger" -> 8224, "prime" -> 8242, "frac12" -> 189,
    "sup2" -> 178, "sup3" -> 179,
    "agrave" -> 224, "eacute" -> 233, "egrave" -> 232, "ccedil" -> 231,
    "ntilde" -> 241, "ouml" -> 246, "uuml" -> 252, "auml" -> 228,
    "szlig" -> 223, "aring" -> 229, "oslash" -> 248,
    "amp" -> 38) // last by convention; order is irrelevant to the scanner

  private val table: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    Named.foreach { case (n, cp) => m.put(n, new String(Character.toChars(cp))) }
    m
  }

  // HTML numeric character references are digits-only: Integer.parseInt
  // would also accept a leading '+' (`&#+65;` → 'A'), silently diverging
  // from any oracle that treats the reference as unrecognized. Validate
  // the body strictly before parsing; unrecognized input passes through.
  private def allIn(s: String, from: Int, lo: Char, hi: Char,
                    lo2: Char = 'z', hi2: Char = 'a', lo3: Char = 'z', hi3: Char = 'a'): Boolean = {
    if (from >= s.length) return false
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (!((c >= lo && c <= hi) || (c >= lo2 && c <= hi2) || (c >= lo3 && c <= hi3))) return false
      i += 1
    }
    true
  }

  private def codePointOf(body: String): Int = {
    try {
      val cp =
        if (body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')) {
          if (!allIn(body, 2, '0', '9', 'a', 'f', 'A', 'F')) -1
          else Integer.parseInt(body.substring(2), 16)
        } else if (body.length > 1) {
          if (!allIn(body, 1, '0', '9')) -1
          else Integer.parseInt(body.substring(1))
        } else -1
      // refuse controls (incl. TAB/LF — entity-decoding a control into
      // curated text would undo the hygiene scrub) and surrogates
      if (cp >= 0x20 && Character.isValidCodePoint(cp) &&
        !(cp >= 0xD800 && cp <= 0xDFFF)) cp else -1
    } catch { case _: NumberFormatException => -1 }
  }

  /** Referenced from generated code — must stay public. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = str.indexOf('&')
    if (i < 0) return s // fast path: no ampersand, no allocation
    val sb = new java.lang.StringBuilder(str.length)
    sb.append(str, 0, i)
    val len = str.length
    while (i < len) {
      val c = str.charAt(i)
      if (c == '&') {
        val semi = str.indexOf(';', i + 1)
        val ok = semi > i + 1 && semi - i - 1 <= MaxBody
        val body = if (ok) str.substring(i + 1, semi) else null
        if (ok && body.charAt(0) == '#') {
          val cp = codePointOf(body)
          if (cp >= 0) { sb.appendCodePoint(cp); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else if (ok && table.containsKey(body)) {
          sb.append(table.get(body)); i = semi + 1
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  def decodeEntities(text: Column): Column =
    shims.column(DecodeEntities(shims.expression(text)))
}
