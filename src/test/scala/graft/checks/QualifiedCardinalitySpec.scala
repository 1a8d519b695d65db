package graft.checks

import graft.SparkTestBase
import graft.model._

/** Qualified object-cardinality (owl:onClass) semantics: only values whose
  * target's class is in the qualifying closure count — mixed-class targets
  * exercise the path the golden fixture can't (its image targets are all
  * Image-class).
  */
class QualifiedCardinalitySpec extends SparkTestBase {

  private val schema = SchemaDef(
    kinds = Seq(KindDef("has", "object", Nil, "c:Root")),
    classes = Seq("c:A", "c:Img", "c:Txt", "c:Root"),
    subClassOf = Seq("c:A" -> "c:Root", "c:Img" -> "c:Root", "c:Txt" -> "c:Root"),
    restrictions = Seq(
      RestrictionDef("c:A", "has", "max", 1, null, "c:Img"),
      RestrictionDef("c:A", "has", "min", 1, null, "c:Txt"),
      RestrictionDef("c:A", "has", "exact", 1, null, "c:Img")),
    facets = Nil)

  private def doc(id: String, cls: String, refs: Seq[String]): Document =
    Document(id, Span("type", cls, null, 0) +:
      refs.zipWithIndex.map { case (r, i) => Span("has", null, r, i + 1) })

  test("qualified counts emit the -101 series; -103 only when NO value at all") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      doc("d:img1", "c:Img", Nil),
      doc("d:img2", "c:Img", Nil),
      doc("d:txt1", "c:Txt", Nil),
      // 2 Img targets -> MAX-101 and EXACT-101 (qual cnt 2); 1 Txt -> MIN ok
      doc("d:over", "c:A", Seq("d:img1", "d:img2", "d:txt1")),
      // 1 Img, 1 Txt -> all ok
      doc("d:ok", "c:A", Seq("d:img1", "d:txt1")),
      // ZERO Txt targets among 2 values: the reference's count query binds
      // no group (no qualifying value) and its zero query requires NO value
      // of the property at all -> MIN escapes entirely (quirk preserved);
      // the 2 Img targets still breach MAX/EXACT
      doc("d:none", "c:A", Seq("d:img1", "d:img2")),
      // NO `has` value at all -> MIN-103 + EXACT-103 (the not-exists query)
      doc("d:empty", "c:A", Nil),
      // non-A doc: restrictions don't apply
      doc("d:other", "c:Img", Seq("d:img1", "d:img2"))
    ).toDF()

    val rows = CheckCardinality.run(CheckContext(spark, docs, schema)).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(4))).toSet
    assert(rows == Set(
      ("OWL-RESTRICTION-MAX-101", "d:over", "2"),
      ("OWL-RESTRICTION-MAX-101", "d:none", "2"),
      ("OWL-RESTRICTION-EXACT-101", "d:over", "2"),
      ("OWL-RESTRICTION-EXACT-101", "d:none", "2"),
      ("OWL-RESTRICTION-MIN-103", "d:empty", "0"),
      ("OWL-RESTRICTION-EXACT-103", "d:empty", "0")))
  }

  test("object some/only variants: SOME-101 needs a value, ONLY-101 per offender") {
    val session = spark
    import session.implicits._
    val s2 = schema.copy(restrictions = Seq(
      RestrictionDef("c:A", "has", "some", 0, null, "c:Img"),
      RestrictionDef("c:A", "has", "only", 0, null, "c:Img")))
    val docs = Seq(
      doc("d:img1", "c:Img", Nil),
      doc("d:txt1", "c:Txt", Nil),
      doc("d:a1", "c:A", Seq("d:img1")),            // both satisfied
      doc("d:a2", "c:A", Seq("d:txt1")),            // SOME-101 + ONLY-101
      doc("d:a3", "c:A", Nil),                      // no value: SOME silent (ref :692)
      doc("d:a4", "c:A", Seq("d:img1", "d:txt1")),  // ONLY-101 only
      doc("d:a5", "c:A", Seq("d:missing"))          // dangling → owl:Thing: both fire
    ).toDF()
    val ctx = CheckContext(spark, docs, s2)
    val some = CheckSome.run(ctx).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(4))).toSet
    val only = CheckOnly.run(ctx).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(4))).toSet
    assert(some == Set(
      ("OWL-RESTRICTION-SOME-101", "d:a2", null),
      ("OWL-RESTRICTION-SOME-101", "d:a5", null)))
    assert(only == Set(
      ("OWL-RESTRICTION-ONLY-101", "d:a2", "d:txt1"),
      ("OWL-RESTRICTION-ONLY-101", "d:a4", "d:txt1"),
      ("OWL-RESTRICTION-ONLY-101", "d:a5", "d:missing")))
  }

  test("cardinality validity sub-pass: one error per distinct invalid value") {
    val session = spark
    import session.implicits._
    val s3 = SchemaDef(
      kinds = Seq(KindDef("num", "datatype", Nil, SchemaDef.XSD + "integer")),
      classes = Seq("c:A"), subClassOf = Nil,
      restrictions = Seq(
        RestrictionDef("c:A", "num", "min", 1, SchemaDef.XSD + "integer", null),
        RestrictionDef("c:A", "num", "max", 9, SchemaDef.XSD + "integer", null)),
      facets = Nil)
    def tdoc(id: String, cls: String, vals: Seq[String]): Document =
      Document(id, Span("type", cls, null, 0) +:
        vals.zipWithIndex.map { case (v, i) => Span("num", v, null, i + 1) })
    val docs = Seq(
      tdoc("d:v", "c:A", Seq("1", "x", "x", "y")), // x deduped within subject
      tdoc("d:w", "c:B", Seq("x"))                 // class not restricted: no sub-pass
    ).toDF()
    val rows = CheckCardinality.run(CheckContext(spark, docs, s3)).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(4))).toSet
    assert(rows == Set(
      ("OWL-RESTRICTION-MIN-104", "d:v", "x"),
      ("OWL-RESTRICTION-MIN-104", "d:v", "y"),
      ("OWL-RESTRICTION-MAX-102", "d:v", "x"),
      ("OWL-RESTRICTION-MAX-102", "d:v", "y")))
  }

  test("field-type check fires for used datatype kinds without fieldType") {
    val session = spark
    import session.implicits._
    val s = SchemaDef(
      kinds = Seq(
        KindDef("t:a", "datatype", Nil, null, fieldType = "text"),
        KindDef("t:b", "datatype", Nil, null)),
      classes = Nil, subClassOf = Nil, restrictions = Nil, facets = Nil)
    val docs = Seq(
      Document("d1", Seq(Span("t:a", "x", null, 0), Span("t:b", "y", null, 1)))).toDF()
    val rows = CheckFieldTypeDefined.run(CheckContext(spark, docs, s)).collect()
    assert(rows.length == 1 && rows(0).getString(3) == "t:b")
  }
}
