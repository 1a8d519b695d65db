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

  /** Union-of-runs violations reader — the REQUIRED read path for a
    * multi-run output dir. Run writes and manifest records are not atomic
    * (the Iceberg-snapshot seam, SURVEY.md §4.5): a run can durably write
    * buckets that never get recorded, and the resume then re-writes them
    * into a new `run=` dir. A naive union would double those rows.
    * Last-run-wins per docId (and per the dataset-level docId-null group)
    * makes the union exact: each document's violations come from the most
    * recent run that validated its bucket. (Re-validation of one snapshot
    * against one constraint set is deterministic, so a doc-granular window
    * equals bucket granularity; different constraints belong in a different
    * outDir — the manifest keys completion by constraintHash for the same
    * reason.)
    */
  def readViolations(spark: SparkSession, outDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.read.parquet(s"$outDir/violations")
      .withColumn("__maxRun", max(col("run")).over(Window.partitionBy(col("docId"))))
      .filter(col("run") === col("__maxRun"))
      .drop("__maxRun", "run")
  }

  /** Union-of-runs verdicts reader: last-run-wins per (partitionId, checkId)
    * — see [[readViolations]] for why the naive union is wrong.
    */
  def readVerdicts(spark: SparkSession, outDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.read.parquet(s"$outDir/verdicts")
      .withColumn("__maxRun",
        max(col("run")).over(Window.partitionBy(col("partitionId"), col("checkId"))))
      .filter(col("run") === col("__maxRun"))
      .drop("__maxRun", "run")
  }

  /** Strictly-increasing run timestamps: two runs into one outDir within
    * the same millisecond (a fast resume loop) would otherwise share a
    * `run=` dir and mode(overwrite) would destroy the earlier run's output.
    */
  private val lastRunId = new java.util.concurrent.atomic.AtomicLong(0L)
  private def nextRunId(): Long =
    lastRunId.updateAndGet(prev => math.max(System.currentTimeMillis(), prev + 1))

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
    val checks = cfg.checkKeys.map { key =>
      val (base, params) = ValidatorConfig.parseCheckKey(key)
      ValidatorConfig.CheckRegistry.getOrElse(base,
        sys.error(s"unknown check key '$base' (known: ${ValidatorConfig.CheckRegistry.keys.toSeq.sorted.mkString(", ")})"))
        .configure(params)
    }

    // bucketed catalog table preferred: the doc_id universe side of the
    // referential joins then scans pre-hashed buckets shuffle-free
    val all = cfg.bucketedTable
      .map(t => Layout.readBucketed(spark, t))
      .getOrElse(spark.read.parquet(cfg.documentsPath))
    val manifest = cfg.manifestPath.map(new Manifest(_))
    val done = manifest.map(_.completedBuckets(cfg.snapshotId, cfg.schema.constraintHash))
      .getOrElse(Set.empty[Int])
    // a resume: some buckets are recorded complete, so this run validates a
    // strict subset. The FIRST recorded run is always a full pass (nothing
    // was in the manifest to filter), so every dataset-level result for this
    // (snapshot, constraintHash) is already durably written by it.
    val isResume = done.nonEmpty
    val docs =
      if (!isResume) all
      else Pipeline.resumable(spark, all, manifest.get, cfg.snapshotId,
        cfg.schema, cfg.nBuckets)

    // run-scoped partition subdirs: a RESUMED run writes alongside prior
    // runs instead of overwriting them (overwrite on the shared dir would
    // destroy buckets the manifest records complete while keeping them
    // marked done); union runs via readViolations/readVerdicts, which
    // apply last-run-wins (a naive parent-dir read double-counts buckets
    // written by a run that crashed before recording them)
    val runId = s"run=${nextRunId()}"

    // referential checks must probe the FULL corpus even on a resume —
    // refs in remaining buckets can point at docs in completed buckets
    val universe = if (isResume) Some(all) else None
    val violationsRaw =
      Pipeline.violations(spark, docs, cfg.schema, checks, universe = universe).cache()
    // dataset-level rows (docId null → bucket -1: vocabulary checks, the
    // -50 warning series, URI-existence) belong to the snapshot, not to a
    // bucket subset. On a resume they were fully written by the first run;
    // recomputing them over the remaining subset would union duplicated,
    // subset-derived rows alongside run 1's (round-2 advice).
    val violations =
      if (isResume) violationsRaw.filter(col("docId").isNotNull) else violationsRaw
    violations.write.mode("overwrite").parquet(s"$outDir/violations/$runId")

    // verdicts roll up the already-materialized violations (no second
    // validation pass); the partitionId = -1 dataset-level verdict row is
    // likewise emitted only by the first (full) run
    val verdictsAll = Pipeline.verdictsFrom(spark, violations, docs, cfg.schema,
      cfg.snapshotId, cfg.nBuckets, checks)
    val verdicts =
      if (isResume) verdictsAll.filter(col("partitionId") >= 0) else verdictsAll
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
    // ALWAYS over the FULL corpus: the fix is snapshot-level, and running it
    // against the resume-filtered subset would treat refs into completed
    // buckets as dangling and overwrite the snapshot with an over-pruned
    // corpus (round-2 advice, high). Idempotent, so a fully-resumed rerun
    // rewrites the same repaired snapshot.
    val fixLog = cfg.fixOut.map { p =>
      Fix.fixDanglingRefs(spark, all, cfg.schema, p).cache()
    }
    val sourceLabel = cfg.bucketedTable.map("table:" + _).getOrElse(cfg.documentsPath)

    // reports and console totals describe the WHOLE snapshot: on a resume
    // this run's frame covers only the remaining buckets (and no
    // dataset-level rows), so read the union of all runs (last-run-wins)
    val snapshotViolations =
      if (isResume) readViolations(spark, outDir) else violations

    cfg.xmlOut.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        Reports.xml(snapshotViolations, Seq(sourceLabel),
          Seq("schema:" + cfg.schema.constraintHash), fixLog = fixLog))
    }
    cfg.jsonOut.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        Reports.json(snapshotViolations, Seq(sourceLabel),
          Seq("schema:" + cfg.schema.constraintHash), fixLog = fixLog))
    }
    fixLog.foreach(_.unpersist())

    val nErr = snapshotViolations.filter(col("severity") === "error").count()
    val nWarn = snapshotViolations.filter(col("severity") === "warning").count()
    println(s"[graft] ${cfg.checkKeys.size} checks, $nErr errors, $nWarn warnings → $outDir")
    violationsRaw.unpersist()
  }
}
