package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.report.Reports

/** End-to-end runner — the `dvt -v` equivalent (reference: dvt:106-203):
  * load config → resume-filter the input → run the check pipeline → persist
  * violations + verdicts → append the manifest → write reports.
  *
  * Usage: `runMain graft.engine.ValidatorApp <config.properties> <outDir>`
  */
object ValidatorApp {

  def main(args: Array[String]): Unit = {
    val Array(configPath, outDir) = args.take(2)
    val cfg = ValidatorConfig.load(configPath)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, cfg, outDir) finally spark.stop()
  }

  def run(spark: SparkSession, cfg: ValidatorConfig, outDir: String): Unit = {
    val checks = cfg.checkKeys.map(k => ValidatorConfig.CheckRegistry.getOrElse(k,
      sys.error(s"unknown check key '$k' (known: ${ValidatorConfig.CheckRegistry.keys.toSeq.sorted.mkString(", ")})")))

    val all = spark.read.parquet(cfg.documentsPath)
    val manifest = cfg.manifestPath.map(new Manifest(_))
    val docs = manifest match {
      case Some(m) => Pipeline.resumable(spark, all, m, cfg.snapshotId, cfg.schema, cfg.nBuckets)
      case None => all
    }

    // run-scoped partition subdirs: a RESUMED run writes alongside prior
    // runs instead of overwriting them (overwrite on the shared dir would
    // destroy buckets the manifest records complete while keeping them
    // marked done); read the parent dir to union all runs
    val runId = s"run=${System.currentTimeMillis()}"

    val violations = Pipeline.violations(spark, docs, cfg.schema, checks).cache()
    violations.write.mode("overwrite").parquet(s"$outDir/violations/$runId")

    // verdicts roll up the already-materialized violations (no second
    // validation pass)
    val verdicts = Pipeline.verdictsFrom(spark, violations, docs, cfg.schema,
      cfg.snapshotId, cfg.nBuckets, checks)
    verdicts.write.mode("overwrite").parquet(s"$outDir/verdicts/$runId")

    // record completed buckets (per-partition lineage + metrics) — THIS
    // run's verdicts only; earlier runs already recorded theirs
    manifest.foreach { m =>
      val stats = spark.read.parquet(s"$outDir/verdicts/$runId")
        .filter(col("partitionId") >= 0)
        .groupBy("partitionId")
        .agg(max("nDocs").as("d"), sum("nViolations").as("v"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      m.recordRun(cfg.snapshotId, cfg.schema.constraintHash, stats.toSeq)
    }

    // --fix analogue: repair dangling refs into a new snapshot and embed
    // the deleted-triples log in the reports (CheckURIExistence.php:190-211).
    // Skipped when the resume filter left nothing to validate — a fully-
    // resumed run must not overwrite a prior fixed snapshot with emptiness.
    val fixLog = cfg.fixOut.filter(_ => !docs.isEmpty).map { p =>
      Fix.fixDanglingRefs(spark, docs, cfg.schema, p).cache()
    }

    cfg.xmlOut.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        Reports.xml(violations, Seq(cfg.documentsPath),
          Seq("schema:" + cfg.schema.constraintHash), fixLog = fixLog))
    }
    cfg.jsonOut.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        Reports.json(violations, Seq(cfg.documentsPath),
          Seq("schema:" + cfg.schema.constraintHash), fixLog = fixLog))
    }
    fixLog.foreach(_.unpersist())

    val nErr = violations.filter(col("severity") === "error").count()
    val nWarn = violations.filter(col("severity") === "warning").count()
    println(s"[graft] ${cfg.checkKeys.size} checks, $nErr errors, $nWarn warnings → $outDir")
    violations.unpersist()
  }
}
