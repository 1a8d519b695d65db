package graft.engine

import graft.SparkTestBase
import graft.checks.{CheckContext, CheckUriExistence}
import graft.datagen.DocGen

class LayoutSpec extends SparkTestBase {

  test("bucketed corpus: universe side of the referential join reads without a shuffle") {
    val docs = DocGen.documents(spark, 2000L).toDF()
    spark.sql("DROP TABLE IF EXISTS graft_docs_bucketed")
    // a previously failed write can leave an orphaned managed location
    val loc = new java.io.File("spark-warehouse/graft_docs_bucketed")
    if (loc.exists) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    Layout.writeBucketed(docs, "graft_docs_bucketed", 4)

    val bucketed = Layout.readBucketed(spark, "graft_docs_bucketed")
    val viol = CheckUriExistence.run(CheckContext(spark, bucketed, DocGen.schema))

    // correctness unchanged vs the unbucketed corpus
    val expected = CheckUriExistence.run(CheckContext(spark, docs, DocGen.schema))
      .collect().map(_.toString).toSet
    assert(viol.collect().map(_.toString).toSet == expected)
    assert(expected.nonEmpty)

    // plan evidence: the universe (right/build) side scan is bucketed —
    // "Bucketed: true" appears and no Exchange feeds it
    val plan = viol.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"expected a bucketed scan in:\n$plan")
  }
}
