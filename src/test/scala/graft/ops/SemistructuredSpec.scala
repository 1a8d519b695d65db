package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SemistructuredSpec extends SparkTestBase {

  test("jsonField / parseTyped / flatten: typed extraction, null for dirty rows") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, """{"k": 7, "tag": "a"}"""),
      (2L, """{"k": "not-a-number"}"""),
      (3L, """not json at all"""),
      (4L, null.asInstanceOf[String])).toDF("id", "props")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("tag", StringType)))
    val flat = Semistructured.flatten(
      Semistructured.parseTyped(df, "props", schema), "props_t")
    assert(flat.columns.toSeq == Seq("id", "props", "k", "tag"))
    val rows = flat.collect().map(r =>
      r.getLong(0) -> (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows(1L) == (Some(7L), Some("a")))
    assert(rows(2L) == (None, None)) // type mismatch → null field
    assert(rows(3L) == (None, None)) // invalid JSON → null fields
    assert(rows(4L) == (None, None))
    // single-path probe agrees with the typed parse where both succeed
    // try_cast: under ANSI (Spark 4 default) a plain cast THROWS on doc 2's
    // "not-a-number" — the dirty-lake probe must degrade to null instead
    val probe = df.select(col("id"),
      Semistructured.jsonField(col("props"), "$.k").try_cast("long").as("k"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(probe(1L) == Some(7L) && probe(3L).isEmpty)
  }

  test("CorpusReport.bySource: exact volume, language spread, within-source dups") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "s1", "en"),
      (2L, "ALPHA   beta gamma", "s1", "en"), // canonical dup of doc 1
      (3L, "quatre cinq", "s1", "fr"),
      (5L, null, "s1", "en"), // null text: n_null_text, NOT a duplicate
      (6L, null, "s1", "en"),
      (4L, "one two three four", "s2", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val rep = CorpusReport.bySource(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = rep("s1")
    assert(s1.getAs[Long]("n_docs") == 5L)
    assert(s1.getAs[Long]("n_tokens") == 8L)
    assert(s1.getAs[Long]("n_langs") == 2L)
    assert(s1.getAs[Long]("n_dup_docs") == 1L,
      "docs 1+2 share a fingerprint; the two null-text docs must not count")
    assert(s1.getAs[Long]("n_null_text") == 2L)
    assert(rep("s2").getAs[Long]("n_dup_docs") == 0L)
    assert(rep("s2").getAs[Long]("n_null_text") == 0L)
    assert(rep("s2").getAs[Double]("avg_chars") == 18.0)
  }
}
