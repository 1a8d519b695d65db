package graft.engine

import graft.SparkTestBase
import graft.datagen.DocGen
import java.nio.file.Files

class ValidatorAppSpec extends SparkTestBase {

  test("config round-trip: dvt.ini-equivalent properties file → SchemaDef + pipeline") {
    val tmp = Files.createTempDirectory("graft-app").toString
    DocGen.documents(spark, 2000L).toDF()
      .write.mode("overwrite").parquet(s"$tmp/docs")

    val conf =
      s"""# graft run config (dvt.ini analogue)
         |data.documents = $tmp/docs
         |data.snapshotId = snap-t1
         |checks = kinds-defined, uri-existence, datatype, cardinality
         |schema.kind.txt:title = datatype||http://www.w3.org/2001/XMLSchema#string
         |schema.kind.txt:count = datatype||http://www.w3.org/2001/XMLSchema#unsignedInt
         |schema.kind.med:link = object||class:Root
         |schema.class = class:Article, class:Root
         |schema.subclass = class:Article<class:Root
         |schema.restriction = class:Article|txt:title|min|1|http://www.w3.org/2001/XMLSchema#string|
         |output.json = $tmp/report.json
         |manifest = $tmp/manifest.jsonl
         |buckets = 8
         |fix.out = $tmp/fixed
         |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$tmp/run.properties"), conf)

    val cfg = ValidatorConfig.load(s"$tmp/run.properties")
    assert(cfg.checkKeys == Seq("kinds-defined", "uri-existence", "datatype", "cardinality"))
    assert(cfg.schema.kinds.size == 3)
    assert(cfg.schema.subClassOf == Seq(("class:Article", "class:Root")))
    assert(cfg.schema.restrictions.head.rtype == "min")

    ValidatorApp.run(spark, cfg, s"$tmp/out")
    val v = spark.read.parquet(s"$tmp/out/violations")
    val firstRunViolations = v.count()
    assert(firstRunViolations > 0) // plants fire even under the reduced schema
    assert(Files.exists(java.nio.file.Paths.get(s"$tmp/report.json")))
    assert(Files.exists(java.nio.file.Paths.get(s"$tmp/manifest.jsonl")))

    // --fix: repaired snapshot written, deleted-triples log in the report
    assert(spark.read.parquet(s"$tmp/fixed").count() == 2000L)
    val report = Files.readString(java.nio.file.Paths.get(s"$tmp/report.json"))
    assert(report.contains("\"fixes\"") && report.contains("\"predicate\": \"med:link\""))

    // resume: second run over the same snapshot+schema skips everything
    val before = new Manifest(s"$tmp/manifest.jsonl")
      .completedBuckets("snap-t1", cfg.schema.constraintHash)
    assert(before.nonEmpty)
    val remaining = Pipeline.resumable(spark,
      spark.read.parquet(s"$tmp/docs"), new Manifest(s"$tmp/manifest.jsonl"),
      "snap-t1", cfg.schema, 8)
    assert(remaining.count() == 0)

    // resumed run writes run-scoped output: prior buckets' results survive
    ValidatorApp.run(spark, cfg, s"$tmp/out")
    val afterResume = spark.read.parquet(s"$tmp/out/violations").count()
    assert(afterResume == firstRunViolations,
      s"resume clobbered prior results: $afterResume != $firstRunViolations")
  }
}
