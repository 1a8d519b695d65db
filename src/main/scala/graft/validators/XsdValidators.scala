package graft.validators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.{FacetDef, SchemaDef}

/** Lexical-space validators for the ~33 XSD/RDF datatypes the reference
  * supports (checks/Check.php:87-554), re-expressed as pure `Column`
  * predicate builders: every validator compiles to built-in, whole-stage-
  * codegen'd expressions (`rlike`, `try_cast`, `isin`, `unbase64`) — zero
  * Scala UDFs, so a validation pass over 10^12 rows stays inside Tungsten.
  *
  * Regexes are ported verbatim from the reference where the reference is
  * regex-based (dateTime Check.php:89, anyURI Check.php:160, language :439,
  * Name :447, NCName :455, NMTOKEN :463, PlainLiteral :553, decimal :218)
  * including their quirks (e.g. the `[a-zA-z]` ranges) so the parity corpus
  * (Check.php:955-1227) passes byte-for-byte.
  *
  * Documented deviations from PHP artifacts (behavior follows the evident
  * spec intent, matching the reference's own self-test expectations):
  *  - boolean: exactly {true,false,0,1} (Check.php:1001-1007 expects 'TRUE'
  *    and 'T' to be invalid; PHP's filter_var would accept 'TRUE').
  *  - integer family: leading zeros are accepted (XSD canonical-form
  *    superset); PHP's FILTER_VALIDATE_INT rejects them. Untested in the
  *    reference corpus.
  *  - unsignedLong: full spec range [0, 18446744073709551615] via decimal
  *    compare; PHP's filter_var overflows above 2^63-1 (Check.php:405-417).
  */
object XsdValidators {

  // --- regex constants ------------------------------------------------

  /** ISO-8601 mega-regex, verbatim from Check.php:89. Accepts reduced forms
    * (`1997`, `1997-07`, week dates) that to_timestamp would reject — which
    * is why we keep the regex rather than a cast.
    */
  val DateTimeRegex: String =
    """^([+-]?\d{4}(?!\d{2}\b))((-?)((0[1-9]|1[0-2])(\3([12]\d|0[1-9]|3[01]))?|W([0-4]\d|5[0-2])(-?[1-7])?|(00[1-9]|0[1-9]\d|[12]\d{2}|3([0-5]\d|6[1-6])))([T\s]((([01]\d|2[0-3])((:?)[0-5]\d)?|24\:?00)([\.,]\d+(?!:))?)?(\17[0-5]\d([\.,]\d+)?)?([zZ]|([+-])([01]\d|2[0-3]):?([0-5]\d)?)?)?)?$"""

  /** dateTimeStamp: date + mandatory time with seconds + mandatory TZ,
    * verbatim from Check.php:140 (applied after the dateTime regex, as the
    * reference does at Check.php:136-153).
    */
  val DateTimeStampRegex: String =
    """^([+-]?\d{4}(?!\d{2}\b))((-?)((0[1-9]|1[0-2])(\3([12]\d|0[1-9]|3[01]))?|W([0-4]\d|5[0-2])(-?[1-7])?|(00[1-9]|0[1-9]\d|[12]\d{2}|3([0-5]\d|6[1-6])))([T\s]((([01]\d|2[0-3])((:?)[0-5]\d)?|24\:?00)([\.,]\d+(?!:))?)(\17[0-5]\d([\.,]\d+)?)([zZ]|([+-])([01]\d|2[0-3]):?([0-5]\d)?))?)?$"""

  /** RFC-3987 IRI regex, verbatim from Check.php:160 (PHP `/iu` flags →
    * embedded `(?iu)`).
    */
  val AnyUriRegex: String =
    "(?iu)^[a-z](?:[-a-z0-9+\\.])*:(?:\\/\\/(?:(?:%[0-9a-f][0-9a-f]|[-a-z0-9\\._~\\x{A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}\\x{30000}-\\x{3FFFD}\\x{40000}-\\x{4FFFD}\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}\\x{90000}-\\x{9FFFD}\\x{A0000}-\\x{AFFFD}\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}!\\$&'\\(\\)\\*\\+,;=:])*@)?(?:\\[(?:(?:(?:[0-9a-f]{1,4}:){6}(?:[0-9a-f]{1,4}:[0-9a-f]{1,4}|(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])(?:\\.(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])){3})|::(?:[0-9a-f]{1,4}:){5}(?:[0-9a-f]{1,4}:[0-9a-f]{1,4}|(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])(?:\\.(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])){3})|(?:[0-9a-f]{1,4})?::(?:[0-9a-f]{1,4}:){4}(?:[0-9a-f]{1,4}:[0-9a-f]{1,4}|(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])(?:\\.(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])){3})|(?:[0-9a-f]{1,4}:[0-9a-f]{1,4})?::(?:[0-9a-f]{1,4}:){3}(?:[0-9a-f]{1,4}:[0-9a-f]{1,4}|(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])(?:\\.(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])){3})|(?:(?:[0-9a-f]{1,4}:){0,2}[0-9a-f]{1,4})?::(?:[0-9a-f]{1,4}:){2}(?:[0-9a-f]{1,4}:[0-9a-f]{1,4}|(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])(?:\\.(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])){3})|(?:(?:[0-9a-f]{1,4}:){0,3}[0-9a-f]{1,4})?::[0-9a-f]{1,4}:(?:[0-9a-f]{1,4}:[0-9a-f]{1,4}|(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])(?:\\.(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])){3})|(?:(?:[0-9a-f]{1,4}:){0,4}[0-9a-f]{1,4})?::(?:[0-9a-f]{1,4}:[0-9a-f]{1,4}|(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])(?:\\.(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])){3})|(?:(?:[0-9a-f]{1,4}:){0,5}[0-9a-f]{1,4})?::[0-9a-f]{1,4}|(?:(?:[0-9a-f]{1,4}:){0,6}[0-9a-f]{1,4})?::)|v[0-9a-f]+[-a-z0-9\\._~!\\$&'\\(\\)\\*\\+,;=:]+)\\]|(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])(?:\\.(?:[0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])){3}|(?:%[0-9a-f][0-9a-f]|[-a-z0-9\\._~\\x{A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}\\x{30000}-\\x{3FFFD}\\x{40000}-\\x{4FFFD}\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}\\x{90000}-\\x{9FFFD}\\x{A0000}-\\x{AFFFD}\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}!\\$&'\\(\\)\\*\\+,;=@])*)(?::[0-9]*)?(?:\\/(?:(?:%[0-9a-f][0-9a-f]|[-a-z0-9\\._~\\x{A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}\\x{30000}-\\x{3FFFD}\\x{40000}-\\x{4FFFD}\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}\\x{90000}-\\x{9FFFD}\\x{A0000}-\\x{AFFFD}\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}!\\$&'\\(\\)\\*\\+,;=:@]))*)*|\\/(?:(?:(?:(?:%[0-9a-f][0-9a-f]|[-a-z0-9\\._~\\x{A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}\\x{30000}-\\x{3FFFD}\\x{40000}-\\x{4FFFD}\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}\\x{90000}-\\x{9FFFD}\\x{A0000}-\\x{AFFFD}\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}!\\$&'\\(\\)\\*\\+,;=:@]))+)(?:\\/(?:(?:%[0-9a-f][0-9a-f]|[-a-z0-9\\._~\\x{A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}\\x{30000}-\\x{3FFFD}\\x{40000}-\\x{4FFFD}\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}\\x{90000}-\\x{9FFFD}\\x{A0000}-\\x{AFFFD}\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}!\\$&'\\(\\)\\*\\+,;=:@]))*)*)?|(?:(?:(?:%[0-9a-f][0-9a-f]|[-a-z0-9\\._~\\x{A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}\\x{30000}-\\x{3FFFD}\\x{40000}-\\x{4FFFD}\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}\\x{90000}-\\x{9FFFD}\\x{A0000}-\\x{AFFFD}\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}!\\$&'\\(\\)\\*\\+,;=:@]))+)(?:\\/(?:(?:%[0-9a-f][0-9a-f]|[-a-z0-9\\._~\\x{A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}\\x{30000}-\\x{3FFFD}\\x{40000}-\\x{4FFFD}\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}\\x{90000}-\\x{9FFFD}\\x{A0000}-\\x{AFFFD}\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}!\\$&'\\(\\)\\*\\+,;=:@]))*)*|(?!(?:%[0-9a-f][0-9a-f]|[-a-z0-9\\._~\\x{A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}\\x{30000}-\\x{3FFFD}\\x{40000}-\\x{4FFFD}\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}\\x{90000}-\\x{9FFFD}\\x{A0000}-\\x{AFFFD}\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}!\\$&'\\(\\)\\*\\+,;=:@])))(?:\\?(?:(?:%[0-9a-f][0-9a-f]|[-a-z0-9\\._~\\x{A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}\\x{30000}-\\x{3FFFD}\\x{40000}-\\x{4FFFD}\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}\\x{90000}-\\x{9FFFD}\\x{A0000}-\\x{AFFFD}\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}!\\$&'\\(\\)\\*\\+,;=:@])|[\\x{E000}-\\x{F8FF}\\x{F0000}-\\x{FFFFD}|\\x{100000}-\\x{10FFFD}\\/\\?])*)?(?:\\#(?:(?:%[0-9a-f][0-9a-f]|[-a-z0-9\\._~\\x{A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}\\x{30000}-\\x{3FFFD}\\x{40000}-\\x{4FFFD}\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}\\x{90000}-\\x{9FFFD}\\x{A0000}-\\x{AFFFD}\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}!\\$&'\\(\\)\\*\\+,;=:@])|[\\/\\?])*)?$"

  /** xsd:decimal, verbatim from Check.php:218 (incl. its quirk that the
    * exponent's `e` is optional).
    */
  val DecimalRegex: String = """^[+-]?(\d*\.?\d+([eE]?[+-]?\d+)?|\d+[eE][+-]?\d+)$"""

  /** PHP is_numeric equivalent (double/float lexical space, Check.php:224-245). */
  val NumericRegex: String = """^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"""

  val IntegerRegex: String = """^[+-]?\d+$"""
  val HexBinaryRegex: String = "^([0-9a-fA-F]{2})+$"
  val LanguageRegex: String = "^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$"
  // [a-zA-z] ranges kept verbatim from Check.php:447,455,463.
  val NameRegex: String = """^[a-zA-Z_:]{1}[a-zA-z0-9_:\-\.]*$"""
  val NCNameRegex: String = """^[a-zA-Z_]{1}[a-zA-z0-9_\-\.]*$"""
  val NmtokenRegex: String = """^[\s]*[a-zA-z0-9_\-\.:]+[\s]*$"""
  val PlainLiteralRegex: String = "^.*@([a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*)*$"

  /** XML-embeddable text (Check.php:469-483 wraps the value in `<test>` and
    * parses): CharData must contain no `<`, and `&` only as a well-formed
    * entity or character reference.
    */
  val XmlTextRegex: String = """^(?:[^<&]|&(?:amp|lt|gt|apos|quot);|&#[0-9]+;|&#x[0-9a-fA-F]+;)*$"""

  // --- predicate builders ----------------------------------------------

  private def intInRange(c: Column, lo: String, hi: String): Column = {
    val d = c.try_cast("decimal(38,0)")
    c.rlike(IntegerRegex) && d.isNotNull &&
      d >= lit(new java.math.BigDecimal(lo)) && d <= lit(new java.math.BigDecimal(hi))
  }

  def dateTime(c: Column): Column = c.rlike(DateTimeRegex)
  def dateTimeStamp(c: Column): Column =
    c.rlike(DateTimeRegex) && c.rlike(DateTimeStampRegex)
  def anyURI(c: Column): Column = c.rlike(AnyUriRegex)
  def boolean(c: Column): Column = c.isin("true", "false", "0", "1")
  def decimalT(c: Column): Column = c.rlike(DecimalRegex)
  def doubleT(c: Column): Column = c.isin("NaN", "INF", "-INF") || c.rlike(NumericRegex)
  def floatT(c: Column): Column = doubleT(c)
  def integer(c: Column): Column = c.rlike(IntegerRegex) && c.try_cast("decimal(38,0)").isNotNull
  def byteT(c: Column): Column = intInRange(c, "-128", "127")
  def unsignedByte(c: Column): Column = intInRange(c, "0", "255")
  def shortT(c: Column): Column = intInRange(c, "-32768", "32767")
  def unsignedShort(c: Column): Column = intInRange(c, "0", "65535")
  def intT(c: Column): Column = intInRange(c, "-2147483648", "2147483647")
  def unsignedInt(c: Column): Column = intInRange(c, "0", "4294967295")
  def longT(c: Column): Column = intInRange(c, "-9223372036854775808", "9223372036854775807")
  def unsignedLong(c: Column): Column = intInRange(c, "0", "18446744073709551615")
  def nonNegativeInteger(c: Column): Column = integer(c) && c.try_cast("decimal(38,0)") >= 0
  def nonPositiveInteger(c: Column): Column = integer(c) && c.try_cast("decimal(38,0)") <= 0
  def positiveInteger(c: Column): Column = integer(c) && c.try_cast("decimal(38,0)") >= 1
  def negativeInteger(c: Column): Column = integer(c) && c.try_cast("decimal(38,0)") <= -1
  def hexBinary(c: Column): Column = c.rlike(HexBinaryRegex)

  /** Canonical base64 shape: whole 4-char units with standard padding.
    * Required before unbase64, which THROWS on dangling units (unlike PHP's
    * lenient base64_decode). Any value the reference accepts re-encodes to
    * exactly this shape, so the guard never changes a verdict.
    */
  val Base64ShapeRegex: String =
    "^([A-Za-z0-9+/]{4})*([A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"

  /** Decode-reencode equivalence, mirroring Check.php:102-112 (PHP's lenient
    * base64_decode followed by strict re-encode): non-canonical input fails
    * the round-trip. Short-circuits on the shape guard.
    */
  def base64Binary(c: Column): Column =
    c.rlike(Base64ShapeRegex) && base64(unbase64(c)) === c

  def language(c: Column): Column = c.rlike(LanguageRegex)
  def nameT(c: Column): Column = c.rlike(NameRegex)
  def ncName(c: Column): Column = c.rlike(NCNameRegex)
  def nmtoken(c: Column): Column = c.rlike(NmtokenRegex)
  def stringT(c: Column): Column = c.rlike(XmlTextRegex)
  def token(c: Column): Column = c.rlike(XmlTextRegex)
  def normalizedString(c: Column): Column = c.rlike(XmlTextRegex)
  def xmlLiteral(c: Column): Column = stringT(c)
  def plainLiteral(c: Column): Column = c.rlike(PlainLiteralRegex)
  def anySimpleType(c: Column): Column = lit(true)

  /** Datatype-URI → validator dispatch, covering every case of the
    * reference's switch (Check.php:618-843 and the per-check dispatch in
    * CheckDatatypePropertiesDatatype.php:238-480). Unknown datatypes fall
    * back to anySimpleType (always valid), as the reference's `default` does.
    */
  val byDatatype: Map[String, Column => Column] = {
    val x = SchemaDef.XSD
    val r = SchemaDef.RDF
    Map(
      x + "base64Binary" -> base64Binary _,
      x + "boolean" -> boolean _,
      x + "byte" -> byteT _,
      x + "dateTimeStamp" -> dateTimeStamp _,
      x + "dateTime" -> dateTime _,
      x + "decimal" -> decimalT _,
      x + "double" -> doubleT _,
      x + "float" -> floatT _,
      x + "hexBinary" -> hexBinary _,
      x + "int" -> intT _,
      x + "integer" -> integer _,
      x + "language" -> language _,
      x + "long" -> longT _,
      x + "Name" -> nameT _,
      x + "NCName" -> ncName _,
      x + "negativeInteger" -> negativeInteger _,
      x + "NMTOKEN" -> nmtoken _,
      x + "nonNegativeInteger" -> nonNegativeInteger _,
      x + "nonPositiveInteger" -> nonPositiveInteger _,
      x + "normalizedString" -> normalizedString _,
      r + "PlainLiteral" -> plainLiteral _,
      x + "positiveInteger" -> positiveInteger _,
      x + "short" -> shortT _,
      x + "string" -> stringT _,
      x + "token" -> token _,
      x + "unsignedByte" -> unsignedByte _,
      x + "unsignedInt" -> unsignedInt _,
      x + "unsignedLong" -> unsignedLong _,
      x + "unsignedShort" -> unsignedShort _,
      r + "XMLLiteral" -> xmlLiteral _,
      x + "anyURI" -> anyURI _,
      x + "anySimpleType" -> anySimpleType _
    )
  }

  /** Validator for a datatype URI; unknown URIs validate as anySimpleType. */
  def forDatatype(datatype: String): Column => Column =
    byDatatype.getOrElse(datatype, anySimpleType _)

  /** XSP facet-constrained custom datatype (Check.php:559-953) as a single
    * composed predicate. Semantics: conjunction of base-type validity,
    * pattern, numeric bounds (which imply decimal validity) and length
    * facets. (Deviation from the reference's first-facet-wins control flow
    * and its `length`-reads-`maxLength` bug, Check.php:849-951 — see the
    * class doc.)
    */
  def facet(f: FacetDef)(c: Column): Column = {
    var p: Column = if (f.base != null) forDatatype(f.base)(c) else lit(true)
    if (f.pattern != null) p = p && c.rlike(f.pattern)
    val hasNum = f.minInclusive != null || f.maxInclusive != null ||
      f.minExclusive != null || f.maxExclusive != null
    if (hasNum) {
      val d = c.try_cast("decimal(38,10)")
      p = p && c.rlike(DecimalRegex) && d.isNotNull
      if (f.minInclusive != null) p = p && d >= lit(f.minInclusive)
      if (f.minExclusive != null) p = p && d > lit(f.minExclusive)
      if (f.maxInclusive != null) p = p && d <= lit(f.maxInclusive)
      if (f.maxExclusive != null) p = p && d < lit(f.maxExclusive)
    }
    if (f.minLength != null) p = p && length(c) >= f.minLength.intValue()
    if (f.maxLength != null) p = p && length(c) <= f.maxLength.intValue()
    if (f.length != null) p = p && length(c) === f.length.intValue()
    p
  }
}
