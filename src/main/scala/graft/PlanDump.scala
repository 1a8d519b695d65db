package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.datagen.DocGen
import graft.engine.Pipeline
import graft.ops.{Dedup, Similarity, TextAnalysis}
import graft.stats.ColumnStats

/** Dumps `.explain("formatted")` of every headline-bench frame to
  * `plans/<tag>/<name>_<suffix>.txt` — the plan evidence the optimization
  * rounds commit beside their claims. Diagnostics only; not part of the
  * frozen measurement harness.
  *
  * Usage: `runMain graft.PlanDump <outDir> <suffix>` e.g.
  * `runMain graft.PlanDump plans/r09 before`.
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r09"
    val suffix = if (args.length > 1) args(1) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.min(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      Runtime.getRuntime.availableProcessors)
    val corpusPath = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CORPUS",
      "/dev/shm/graft-extra/docs")

    val spark = BenchUtil.session(cpus)
    if (!new java.io.File(corpusPath + "/_SUCCESS").exists()) {
      DocGen.documents(spark, 800000L).toDF()
        .repartition(128).write.mode("overwrite").parquet(corpusPath)
    }
    def docs: DataFrame = spark.read.parquet(corpusPath)
    def tbl(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String)(f: => DataFrame): Unit = {
      try {
        val plan = f.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }

    val schema = DocGen.schema
    dump("validate_full") { Pipeline.violations(spark, docs, schema) }
    dump("verdicts") {
      Pipeline.verdictsFrom(spark, Pipeline.violations(spark, docs, schema),
        docs, schema, "bench", 64)
    }
    dump("stats_profile") { ColumnStats.profile(tbl("lineitem")) }
    dump("stats_mergeable") {
      ColumnStats.mergeProfiles(ColumnStats.mergeableProfile(
        tbl("documents"), "source", Seq("doc_id", "n_chars", "lang")))
    }
    dump("dedup_exact") { Dedup.exactGroups(tbl("documents")) }
    dump("dedup_minhash") { Dedup.nearDupPairs(tbl("documents")) }
    dump("dedup_simhash") { Dedup.simhashPairs(tbl("documents")) }
    dump("passage_dedup") { Dedup.passageDedup(tbl("documents")) }
    dump("langid_quality") {
      tbl("documents").select(
        TextAnalysis.langId(col("text")).as("lid"),
        TextAnalysis.qualityScore(col("text")).as("q"))
        .agg(count(lit(1)), avg(col("q")))
    }
    dump("curate") { graft.ops.Curation.curate(tbl("documents")) }
    dump("ann_topk") {
      val emb = tbl("embeddings")
      val q = emb.orderBy("vec_id").limit(1).collect()(0).getSeq[Float](1)
      Similarity.bruteTopK(emb, q, 10)
    }
    spark.stop()
  }
}
