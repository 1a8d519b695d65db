package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkTestBase {

  private def cp(c: Int): String = new String(Character.toChars(c))

  test("curate: hygiene applied, quality-failures dropped, dup collapses to min id") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      (4L, "<p>Solid varied sentence with" + cp(0x08) + " enough words</p>"),
      (9L, "  solid VARIED sentence with enough words  "), // dup of 4 post-clean
      (2L, "too short"),                                   // < 5 tokens
      (3L, "spam spam spam spam spam spam"),               // fails diversity
      (7L, "another keeper with plenty of distinct words &amp; one entity"))
      .toDF("doc_id", "text")
    val got = Curation.curate(docs, minTokens = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == Set(4L, 7L), s"kept: ${got.keySet}")
    assert(got(4L) == "Solid varied sentence with enough words", got(4L))
    assert(got(7L) == "another keeper with plenty of distinct words & one entity", got(7L))
  }

  test("curate plan: the dedup window's exchange is the ONLY shuffle") {
    val session = spark
    import session.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft-curate").toString + "/d"
    (0L until 40L).map(i => (i, s"doc $i has several distinct words here"))
      .toDF("doc_id", "text").repartition(4).write.mode("overwrite").parquet(p)
    val old = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val n = Curation.curate(spark.read.parquet(p)).queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }.size
      assert(n == 1, s"expected exactly the fingerprint-window exchange, got $n")
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
