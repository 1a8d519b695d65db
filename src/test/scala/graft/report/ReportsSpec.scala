package graft.report

import graft.SparkTestBase

class ReportsSpec extends SparkTestBase {

  private def violDf = {
    val session = spark
    import session.implicits._
    Seq(
      ("URI-EXISTENCE-100", "error", null: String, "med:link", "doc:missing:1", "exists"),
      ("URI-EXISTENCE-100", "error", null: String, "med:link", "doc:<&>", "exists"),
      ("DATATYPE-PROPERTIES-DATATYPE-50", "warning", null: String, "txt:note", null: String, null: String),
      ("OWL-RESTRICTION-MAX-101", "error", "doc:000000000438", "med:image", "3", "at most 2")
    ).toDF("checkId", "severity", "docId", "kind", "value", "expected")
  }

  test("XML report: reference envelope, escaped, deterministic") {
    val x = Reports.xml(violDf, Seq("ds:a"), Seq("onto:x"))
    assert(x.startsWith("<checks>\n"))
    assert(x.endsWith("</checks>\n"))
    assert(x.contains("<dataset>ds:a</dataset>"))
    assert(x.contains("<id>URI-EXISTENCE-100</id>"))
    assert(x.contains("doc:&lt;&amp;&gt;")) // escaping
    assert(x.contains("<warning>") && x.contains("<id>DATATYPE-PROPERTIES-DATATYPE-50</id>"))
    // well-formed: parses
    scala.xml.XML.loadString(x)
    // deterministic
    assert(x == Reports.xml(violDf, Seq("ds:a"), Seq("onto:x")))
  }

  test("JSON report: reference envelope, valid JSON") {
    val j = Reports.json(violDf, Seq("ds:a"), Seq("onto:x"))
    assert(j.startsWith("{\n  \"checks\": ["))
    assert(j.contains("\"validationErrors\""))
    assert(j.contains("\"id\": \"OWL-RESTRICTION-MAX-101\""))
    assert(j.contains("\"record\": \"doc:000000000438\""))
    // must be machine-parseable (the reference's writer can emit broken
    // JSON via its comma logic, dvt:183-190 — ours must not)
    val parsed = ujsonLikeParse(j)
    assert(parsed)
  }

  private def ujsonLikeParse(s: String): Boolean = {
    // No JSON lib on the classpath — validate via the JDK Nashorn-free
    // route: Spark's from_json over the struct we expect.
    import org.apache.spark.sql.functions._
    val session = spark
    import session.implicits._
    val df = Seq(s).toDF("j")
      .select(from_json(col("j"), org.apache.spark.sql.types.StructType.fromDDL(
        "checks array<struct<name:string,validationErrors:array<struct<id:string>>>>")).as("p"))
    val row = df.collect()(0)
    !row.isNullAt(0) && row.getStruct(0).getSeq[Any](0).nonEmpty
  }

  test("checkName strips the numeric code") {
    assert(Reports.checkName("URI-EXISTENCE-100") == "URI-EXISTENCE")
    assert(Reports.checkName("OWL-RESTRICTION-MAX-101") == "OWL-RESTRICTION-MAX")
    assert(Reports.checkName("DATATYPE-PROPERTIES-DATATYPE-50") == "DATATYPE-PROPERTIES-DATATYPE")
  }
}
