package graft.datagen

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model._

/** Deterministic synthesized `documents` table (FIXTURES.md §1) in the exact
  * shape of BASELINE.json `input_hint`:
  * `documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`.
  *
  * Generation is a pure function of the row id, so it is seedless-
  * deterministic, embarrassingly parallel (`spark.range(n).map`), and every
  * planted-violation population is computable in closed form from the
  * modulus table below — tests assert exact violation sets against it.
  *
  * Plant table (id ≡ 0 (mod m)); Articles are ids ≡ 0 (mod 6):
  *   m=101  span with undefined kind          → PROPERTIES-DEFINED-100
  *   m=103  type span with undefined class    → CLASSES-DEFINED-100
  *   m=97   dangling media_ref                → URI-EXISTENCE-100
  *   m=89   txt:count = "abc"                 → DATATYPE-PROPERTIES-DATATYPE-101
  *   m=53   txt:uri invalid IRI               → DATATYPE-PROPERTIES-DATATYPE-101
  *   m=47   txt:flag = "T"                    → DATATYPE-PROPERTIES-DATATYPE-101
  *   m=79   Article missing txt:title         → OWL-RESTRICTION-MIN-102 (lcm 474)
  *   m=73   Article with 3 med:image          → OWL-RESTRICTION-MAX-101 (lcm 438;
  *          -101: the med:image restriction is class-qualified)
  *   m=83   Article with 0 txt:date           → OWL-RESTRICTION-EXACT-102 (lcm 498)
  *   m=71   Article with 2 txt:date           → OWL-RESTRICTION-EXACT-100 (lcm 426)
  *   m=29   first txt:date lexically invalid  → DATATYPE-PROPERTIES-DATATYPE-101
  *          (+ OWL-RESTRICTION-EXACT-104 on Articles: the per-value
  *          validity sub-pass of the exact-1 dateTime restriction; lcm 174)
  *   m=37   Article's med:attach targets an Audio doc (normally Video)
  *          → OWL-RESTRICTION-SOME-101 + ONLY-101 (lcm 222; both classes
  *          are in med:attach's range closure class:Media, so the object-
  *          variant plant is invisible to the range check)
  *   m=67   Article with no txt:lang at all   → OWL-RESTRICTION-SOME-100 (lcm 402)
  *   m=61   Article whose only txt:lang is invalid → OWL-RESTRICTION-SOME-102 (lcm 366)
  *   m=59   txt:score = "150" (facet-invalid) → OWL-RESTRICTION-ONLY-100 on Articles (lcm 354)
  *   m=43   med:link → a doc whose class is outside the range closure
  *                                            → OBJECT-PROPERTIES-RANGE-100
  *   m=41   non-Article with a med:image span → OBJECT-DATATYPE-PROPERTIES-DOMAIN-100
  *          (when its class is outside med:image's {Article, Page} domain)
  *
  * Skew knob: ids ≡ 0 (mod 5) point their med:link at doc 0 — one hot
  * media_ref key receiving ~20% of all references, exercising the
  * AQE/salting path of the referential join at scale.
  */
object DocGen {

  val Classes: Seq[String] = Seq(
    "class:Article", "class:Image", "class:Video",
    "class:Audio", "class:Page", "class:Post")

  val UndefinedClass = "class:Undefined"
  val UndefinedKind = "txt:undefinedKind"

  def docId(i: Long): String = f"doc:$i%012d"

  def cls(i: Long): String =
    if (i % 103 == 0) UndefinedClass else Classes((i % 6).toInt)

  def isArticle(i: Long): Boolean = i % 6 == 0 && i % 103 != 0

  /** An Image-class target id: ≡ 1 (mod 6) and not ≡ 0 (mod 103). */
  def imageTarget(i: Long, k: Int, n: Long): Long = {
    val j = ((i * 7 + 13 + k) % (n / 6)) * 6 + 1
    if (j % 103 == 0) { if (j + 6 < n) j + 6 else 7 } else j
  }

  /** A Media-class target id of class offset `off` (2 = Video, 3 = Audio):
    * ≡ off (mod 6) and not ≡ 0 (mod 103).
    */
  def mediaTarget(i: Long, off: Int, n: Long): Long = {
    val j = ((i * 11 + 5) % (n / 6)) * 6 + off
    if (j % 103 == 0) { if (j + 6 < n) j + 6 else off + 6L } else j
  }

  /** Pure per-id document constructor (also used by tests to compute
    * expected violation sets without Spark).
    */
  def make(i: Long, n: Long): Document = {
    val b = Seq.newBuilder[(String, String, String)] // kind, text, media_ref
    b += (("type", cls(i), null))

    if (i % 79 != 0) b += (("txt:title", s"Title $i", null))
    b += (("txt:count", if (i % 89 == 0) "abc" else (i % 1000).toString, null))

    val nDates = if (i % 83 == 0) 0 else if (i % 71 == 0) 2 else 1
    for (d <- 0 until nDates)
      b += (("txt:date",
        if (i % 29 == 0 && d == 0) "2020-99-99T99:99:99Z" // lexically invalid plant
        else f"2020-${(i % 12) + 1}%02d-${(i % 28) + 1}%02dT10:0$d:00Z", null))

    if (i % 67 != 0)
      b += (("txt:lang", if (i % 61 == 0) "longerThan8" else Seq("en", "fr", "de")((i % 3).toInt), null))

    b += (("txt:score", if (i % 59 == 0) "150" else (i % 101).toString, null))
    b += (("txt:flag", if (i % 47 == 0) "T" else if (i % 2 == 0) "true" else "false", null))
    b += (("txt:uri", if (i % 53 == 0) "http://x#a#b" else s"http://example.org/doc/$i", null))
    b += (("txt:note", s"note $i", null))

    // med:image — Articles carry 1 (3 when planting a MAX violation);
    // non-Articles get one at m=41 (a domain violation: med:image's domain
    // is {Article, Page}). Targets are constructed to be Image-class docs
    // (id ≡ 1 mod 6, not ≡ 0 mod 103) so med:image causes no range noise.
    val nImages =
      if (isArticle(i)) (if (i % 73 == 0) 3 else 1)
      else if (i % 41 == 0) 1 else 0
    for (k <- 0 until nImages)
      b += (("med:image", null, docId(imageTarget(i, k, n))))

    // med:attach — every Article carries one; normally a Video-class
    // target, an Audio-class target at m=37 (the SOME-101/ONLY-101 object-
    // variant plant — both classes sit inside the declared range closure
    // class:Media, so the plant never trips the range check)
    if (isArticle(i))
      b += (("med:attach", null, docId(mediaTarget(i, if (i % 37 == 0) 3 else 2, n))))

    // med:link — every doc links; hot key at doc 0 for ids ≡ 0 (mod 5);
    // dangling target when planting URI-EXISTENCE; out-of-range-class
    // target (an Image-class doc via med:link is fine — range is
    // class:Root — so the range plant instead targets class:Undefined docs).
    val linkTarget =
      if (i % 97 == 0) s"doc:missing:$i"
      else if (i % 43 == 0 && n >= 103) docId(((i / 43) % (n / 103)) * 103) // a class:Undefined doc
      else if (i % 5 == 0) docId(0)
      else docId((i * 31 + 7) % n)
    b += (("med:link", null, linkTarget))

    if (i % 101 == 0) b += ((UndefinedKind, "x", null))

    val spans = b.result().zipWithIndex.map { case ((k, t, m), off) =>
      Span(k, t, m, off)
    }
    Document(docId(i), spans)
  }

  /** Distributed generation — a pure map over spark.range, no shuffle. */
  def documents(spark: SparkSession, n: Long): Dataset[Document] = {
    import spark.implicits._
    spark.range(n).as[Long].map(i => make(i, n))
  }

  /** The id range [start, end) of an n-doc corpus — identical rows to
    * `documents(spark, n)` restricted to that range (cross-doc link targets
    * still derive from the GLOBAL n). Lets Bench write its sliced probe
    * corpus one slice at a time with full-size parquet files.
    */
  def documentsRange(spark: SparkSession, start: Long, end: Long,
                     n: Long): Dataset[Document] = {
    import spark.implicits._
    spark.range(start, end).as[Long].map(i => make(i, n))
  }

  /** Asserted-datatype annotation of a span in the ANNOTATED corpus variant
    * (the span-datatype seam). Default: every datatype-kind span is
    * annotated with its declared range (a well-typed source). Plants:
    *   m=31  txt:count → xsd:integer   strict MISMATCH → DATATYPE-...-100
    *         (integer→unsignedInt is NOT a Virtuoso coercion)
    *   m=23  txt:flag  → xsd:integer   whitelisted coercion (boolean ←
    *         integer) → NO -100; lexical validation still runs
    *   m=19  txt:date  → unannotated   strict -100 (rdfs:Literal mismatch)
    *         AND the value stops counting toward the datatype-qualified
    *         EXACT-1 dateTime restriction (datatype() = xsd:string) —
    *         Articles at lcm 114 flip to OWL-RESTRICTION-EXACT-102
    *   m=13  txt:score → xsd:string    strict custom-range skip: the gate
    *         passes (xsd:string) but validateCustomDatatype can't target
    *         'xsd:string', so NO lexical verdict — a doc at lcm(13,59)=767
    *         keeps its "150" without a -101 in strict mode (loose flags it)
    * Non-datatype kinds (type, med:*, txt:note, undefined) stay null.
    */
  def spanDatatype(i: Long, kind: String): String = kind match {
    case "txt:title" => SchemaDef.XSD + "string"
    case "txt:count" =>
      if (i % 31 == 0) SchemaDef.XSD + "integer" else SchemaDef.XSD + "unsignedInt"
    case "txt:date" => if (i % 19 == 0) null else SchemaDef.XSD + "dateTime"
    case "txt:lang" => SchemaDef.XSD + "language"
    case "txt:score" => if (i % 13 == 0) SchemaDef.XSD + "string" else "dt:score"
    case "txt:flag" =>
      if (i % 23 == 0) SchemaDef.XSD + "integer" else SchemaDef.XSD + "boolean"
    case "txt:uri" => SchemaDef.XSD + "anyURI"
    case _ => null
  }

  /** [[make]] with the optional 5th span field populated — the annotated
    * twin corpus for the strict-mode / qualified-count checks.
    */
  def makeAnnotated(i: Long, n: Long): AnnotatedDocument = {
    val d = make(i, n)
    AnnotatedDocument(d.doc_id, d.spans.map(s =>
      AnnotatedSpan(s.kind, s.text, s.media_ref, s.offset, spanDatatype(i, s.kind))))
  }

  def annotatedDocuments(spark: SparkSession, n: Long): Dataset[AnnotatedDocument] = {
    import spark.implicits._
    spark.range(n).as[Long].map(i => makeAnnotated(i, n))
  }

  /** The constraint-schema fixture matching the generator (FIXTURES.md §2). */
  val schema: SchemaDef = SchemaDef(
    kinds = Seq(
      KindDef("txt:title", "datatype", Nil, SchemaDef.XSD + "string"),
      KindDef("txt:count", "datatype", Nil, SchemaDef.XSD + "unsignedInt"),
      KindDef("txt:date", "datatype", Nil, SchemaDef.XSD + "dateTime"),
      KindDef("txt:lang", "datatype", Nil, SchemaDef.XSD + "language"),
      KindDef("txt:score", "datatype", Nil, "dt:score"),
      KindDef("txt:flag", "datatype", Nil, SchemaDef.XSD + "boolean"),
      KindDef("txt:uri", "datatype", Nil, SchemaDef.XSD + "anyURI"),
      KindDef("txt:note", "datatype", Nil, null), // undeclared range → warning
      KindDef("med:image", "object", Seq("class:Article", "class:Page"), "class:Image"),
      KindDef("med:link", "object", Nil, "class:Root"),
      KindDef("med:attach", "object", Nil, "class:Media"),
      KindDef("med:thumb", "object", Nil, null) // defined but unused
    ),
    classes = Classes ++ Seq("class:Media", "class:Content", "class:Root"),
    subClassOf = Seq(
      "class:Image" -> "class:Media",
      "class:Video" -> "class:Media",
      "class:Audio" -> "class:Media",
      "class:Article" -> "class:Content",
      "class:Page" -> "class:Content",
      "class:Post" -> "class:Content",
      "class:Media" -> "class:Root",
      "class:Content" -> "class:Root"
    ),
    restrictions = Seq(
      RestrictionDef("class:Article", "txt:title", "min", 1, SchemaDef.XSD + "string", null),
      RestrictionDef("class:Article", "med:image", "max", 2, null, "class:Image"),
      RestrictionDef("class:Article", "txt:date", "exact", 1, SchemaDef.XSD + "dateTime", null),
      RestrictionDef("class:Article", "txt:lang", "some", 0, SchemaDef.XSD + "language", null),
      RestrictionDef("class:Article", "txt:score", "only", 0, "dt:score", null),
      // object variants: every Article must attach SOME Video-class doc,
      // and ONLY Video-class docs may be attached
      RestrictionDef("class:Article", "med:attach", "some", 0, null, "class:Video"),
      RestrictionDef("class:Article", "med:attach", "only", 0, null, "class:Video")
    ),
    facets = Seq(
      FacetDef("dt:score", base = SchemaDef.XSD + "decimal",
        minInclusive = "0", maxInclusive = "100")
    )
  )
}
