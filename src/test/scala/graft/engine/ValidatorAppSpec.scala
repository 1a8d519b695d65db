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
         |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$tmp/run.properties"), conf)

    val cfg = ValidatorConfig.load(s"$tmp/run.properties")
    assert(cfg.checkKeys == Seq("kinds-defined", "uri-existence", "datatype", "cardinality"))
    assert(cfg.schema.kinds.size == 3)
    assert(cfg.schema.subClassOf == Seq(("class:Article", "class:Root")))
    assert(cfg.schema.restrictions.head.rtype == "min")

    ValidatorApp.run(spark, cfg, s"$tmp/out")
    val v = spark.read.parquet(s"$tmp/out/violations")
    assert(v.count() > 0) // plants fire even under the reduced schema
    assert(Files.exists(java.nio.file.Paths.get(s"$tmp/report.json")))
    assert(Files.exists(java.nio.file.Paths.get(s"$tmp/manifest.jsonl")))

    // resume: second run over the same snapshot+schema skips everything
    val before = new Manifest(s"$tmp/manifest.jsonl")
      .completedBuckets("snap-t1", cfg.schema.constraintHash)
    assert(before.nonEmpty)
    val remaining = Pipeline.resumable(spark,
      spark.read.parquet(s"$tmp/docs"), new Manifest(s"$tmp/manifest.jsonl"),
      "snap-t1", cfg.schema, 8)
    assert(remaining.count() == 0)
  }
}
