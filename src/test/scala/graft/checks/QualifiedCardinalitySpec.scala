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
      RestrictionDef("c:A", "has", "min", 1, null, "c:Txt")),
    facets = Nil)

  private def doc(id: String, cls: String, refs: Seq[String]): Document =
    Document(id, Span("type", cls, null, 0) +:
      refs.zipWithIndex.map { case (r, i) => Span("has", null, r, i + 1) })

  test("only qualifying-class targets count; zero-qualifying docs caught") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      doc("d:img1", "c:Img", Nil),
      doc("d:img2", "c:Img", Nil),
      doc("d:txt1", "c:Txt", Nil),
      // 2 Img targets -> MAX(1, c:Img) violated; 1 Txt -> MIN ok
      doc("d:over", "c:A", Seq("d:img1", "d:img2", "d:txt1")),
      // 1 Img, 1 Txt -> both ok
      doc("d:ok", "c:A", Seq("d:img1", "d:txt1")),
      // ZERO Txt targets -> MIN(1, c:Txt) violated at cnt=0; its 2 Img
      // targets also breach MAX(1, c:Img)
      doc("d:none", "c:A", Seq("d:img1", "d:img2")),
      // non-A doc: restrictions don't apply
      doc("d:other", "c:Img", Seq("d:img1", "d:img2"))
    ).toDF()

    val rows = CheckCardinality.run(CheckContext(spark, docs, schema)).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(4))).toSet
    assert(rows == Set(
      ("OWL-RESTRICTION-MAX-100", "d:over", "2"),
      ("OWL-RESTRICTION-MAX-100", "d:none", "2"),
      ("OWL-RESTRICTION-MIN-102", "d:none", "0")))
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
