package graft.engine

import graft.SparkTestBase
import graft.checks.{CheckContext, CheckUriExistence}
import graft.datagen.DocGen
import org.apache.spark.sql.functions._

class FixSpec extends SparkTestBase {

  test("uri fix: dangling refs removed, type spans kept, check goes green") {
    val n = 3000L
    val docs = DocGen.documents(spark, n).toDF()
    val before = CheckUriExistence.run(CheckContext(spark, docs, DocGen.schema))
    val badCount = before.count()
    assert(badCount > 0)

    val tmp = java.nio.file.Files.createTempDirectory("graft-fix").toString
    val log = Fix.fixDanglingRefs(spark, docs, DocGen.schema, s"$tmp/fixed")

    // fix log matches the plant: one med:link deletion per dangling doc
    val logged = log.collect()
    assert(logged.nonEmpty)
    assert(logged.forall(_.getString(1) == "med:link"))
    val expectedDocs = (0L until n).filter(_ % 97 == 0).map(DocGen.docId).toSet
    assert(logged.map(_.getString(0)).toSet == expectedDocs)

    // re-check over the new snapshot: zero dangling refs
    val fixed = spark.read.parquet(s"$tmp/fixed")
    val after = CheckUriExistence.run(CheckContext(spark, fixed, DocGen.schema))
    assert(after.count() == 0)

    // docs count unchanged; type spans never dropped
    assert(fixed.count() == n)
    val typeless = fixed.filter(
      !exists(col("spans"), s => s.getField("kind") === "type")).count()
    assert(typeless == 0)

    // untouched docs keep exact span sequences
    val untouchedBefore = docs.filter(!col("doc_id").isin(expectedDocs.toSeq: _*))
    val untouchedAfter = fixed.filter(!col("doc_id").isin(expectedDocs.toSeq: _*))
    val mismatch = untouchedBefore.alias("a").join(untouchedAfter.alias("b"), "doc_id")
      .filter(size(col("a.spans")) =!= size(col("b.spans"))).count()
    assert(mismatch == 0)
  }
}
