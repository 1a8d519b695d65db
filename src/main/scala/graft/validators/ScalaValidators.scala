package graft.validators

import java.util.regex.Pattern
import graft.model.{FacetDef, SchemaDef}

/** JVM-side (String => Boolean) twins of the Column validators in
  * [[XsdValidators]] — same regex constants, same semantics — used by the
  * native single-pass validation expression
  * ([[graft.functions.ValidateSpans]]), where a compiled
  * `String => Boolean` beats an interpreted Catalyst lambda tree by an
  * order of magnitude. Parity with the Column versions is asserted by
  * `ValidatorParitySpec` (corpus) and `ScalaValidatorParitySpec`
  * (cross-check on randomized inputs).
  */
object ScalaValidators {

  private def rx(pattern: String): String => Boolean = {
    val p = Pattern.compile(pattern)
    s => p.matcher(s).find()
  }

  private val dateTimeRx = rx(XsdValidators.DateTimeRegex)
  private val dateTimeStampRx = rx(XsdValidators.DateTimeStampRegex)
  private val anyUriRx = rx(XsdValidators.AnyUriRegex)
  private val decimalRx = rx(XsdValidators.DecimalRegex)
  private val numericRx = rx(XsdValidators.NumericRegex)
  private val integerRx = rx(XsdValidators.IntegerRegex)
  private val hexRx = rx(XsdValidators.HexBinaryRegex)
  private val languageRx = rx(XsdValidators.LanguageRegex)
  private val nameRx = rx(XsdValidators.NameRegex)
  private val ncNameRx = rx(XsdValidators.NCNameRegex)
  private val nmtokenRx = rx(XsdValidators.NmtokenRegex)
  private val plainLiteralRx = rx(XsdValidators.PlainLiteralRegex)
  private val xmlTextRx = rx(XsdValidators.XmlTextRegex)

  private def intInRange(lo: BigDecimal, hi: BigDecimal): String => Boolean = { s =>
    integerRx(s) && {
      try { val v = BigDecimal(s); v >= lo && v <= hi }
      catch { case _: NumberFormatException => false }
    }
  }

  /** Precision cap 38 mirrors the Column twin's `try_cast(decimal(38,0))`
    * (XsdValidators.integer): both paths reject integers whose significant
    * digits exceed Spark's max decimal precision.
    */
  val integer: String => Boolean = s =>
    integerRx(s) && (try { BigDecimal(s).precision <= 38 }
      catch { case _: NumberFormatException => false })

  val boolean: String => Boolean = Set("true", "false", "0", "1")

  val doubleT: String => Boolean = s =>
    s == "NaN" || s == "INF" || s == "-INF" || numericRx(s)

  private val base64ShapeRx = rx(XsdValidators.Base64ShapeRegex)

  /** Decode-reencode equivalence matching the Column validator exactly
    * (shape guard + MIME decode + strict re-encode) — Check.php:102-112.
    */
  val base64Binary: String => Boolean = { s =>
    base64ShapeRx(s) && (
      try java.util.Base64.getEncoder.encodeToString(
        java.util.Base64.getMimeDecoder.decode(s)) == s
      catch { case _: IllegalArgumentException => false })
  }

  val byDatatype: Map[String, String => Boolean] = {
    val x = SchemaDef.XSD
    val r = SchemaDef.RDF
    Map(
      x + "base64Binary" -> base64Binary,
      x + "boolean" -> boolean,
      x + "byte" -> intInRange(-128, 127),
      x + "dateTimeStamp" -> (s => dateTimeRx(s) && dateTimeStampRx(s)),
      x + "dateTime" -> dateTimeRx,
      x + "decimal" -> decimalRx,
      x + "double" -> doubleT,
      x + "float" -> doubleT,
      x + "hexBinary" -> hexRx,
      x + "int" -> intInRange(-2147483648L, 2147483647L),
      x + "integer" -> integer,
      x + "language" -> languageRx,
      x + "long" -> intInRange(BigDecimal("-9223372036854775808"), BigDecimal("9223372036854775807")),
      x + "Name" -> nameRx,
      x + "NCName" -> ncNameRx,
      x + "negativeInteger" -> (s => integer(s) && BigDecimal(s) <= -1),
      x + "NMTOKEN" -> nmtokenRx,
      x + "nonNegativeInteger" -> (s => integer(s) && BigDecimal(s) >= 0),
      x + "nonPositiveInteger" -> (s => integer(s) && BigDecimal(s) <= 0),
      x + "normalizedString" -> xmlTextRx,
      r + "PlainLiteral" -> plainLiteralRx,
      x + "positiveInteger" -> (s => integer(s) && BigDecimal(s) >= 1),
      x + "short" -> intInRange(-32768, 32767),
      x + "string" -> xmlTextRx,
      x + "token" -> xmlTextRx,
      x + "unsignedByte" -> intInRange(0, 255),
      x + "unsignedInt" -> intInRange(0, 4294967295L),
      x + "unsignedLong" -> intInRange(0, BigDecimal("18446744073709551615")),
      x + "unsignedShort" -> intInRange(0, 65535),
      r + "XMLLiteral" -> xmlTextRx,
      x + "anyURI" -> anyUriRx,
      x + "anySimpleType" -> (_ => true)
    )
  }

  def forDatatype(dt: String): String => Boolean =
    byDatatype.getOrElse(dt, _ => true)

  /** XSP facet conjunction — same semantics as [[XsdValidators.facet]]. */
  def facet(f: FacetDef): String => Boolean = {
    val base: String => Boolean = if (f.base != null) forDatatype(f.base) else _ => true
    val pat: String => Boolean =
      if (f.pattern != null) rx(f.pattern) else _ => true
    val hasNum = f.minInclusive != null || f.maxInclusive != null ||
      f.minExclusive != null || f.maxExclusive != null
    s => {
      var ok = base(s) && pat(s)
      if (ok && hasNum) {
        ok = decimalRx(s) && {
          try {
            val v = new java.math.BigDecimal(s)
            (f.minInclusive == null || v.compareTo(f.minInclusive) >= 0) &&
              (f.minExclusive == null || v.compareTo(f.minExclusive) > 0) &&
              (f.maxInclusive == null || v.compareTo(f.maxInclusive) <= 0) &&
              (f.maxExclusive == null || v.compareTo(f.maxExclusive) < 0)
          } catch { case _: NumberFormatException => false }
        }
      }
      if (ok && f.minLength != null) ok = s.length >= f.minLength.intValue()
      if (ok && f.maxLength != null) ok = s.length <= f.maxLength.intValue()
      if (ok && f.length != null) ok = s.length == f.length.intValue()
      ok
    }
  }

  /** Facet-aware dispatch mirroring CheckContext.validatorFor. */
  def validatorFor(schema: SchemaDef, dt: String): String => Boolean =
    schema.facets.find(_.datatype == dt) match {
      case Some(f) => facet(f)
      case None => forDatatype(dt)
    }
}
