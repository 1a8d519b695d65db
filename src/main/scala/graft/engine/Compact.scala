package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Output-dir compaction — the Iceberg `rewrite_data_files` +
  * `expire_snapshots` analogue for a long-lived multi-run validation
  * outDir. A 10^12-doc snapshot validated through many partial resumes
  * accumulates one `run=` dir per attempt; every union read then lists and
  * winner-joins all of them forever. `compact` rewrites the CURRENT
  * snapshot (winner rows only) as ONE new committed baseline run, rewrites
  * the manifest to reference only that run (atomic file replace — readers
  * never see a half-state), and optionally deletes the superseded run
  * dirs.
  *
  * Invariants (CompactSpec): readers return the identical row set before
  * and after; a subsequent resume sees every bucket complete (the
  * compacted run records full bucket completion under the same
  * (snapshotId, constraintHash, checksHash) key); after
  * `deleteOldRuns = true` exactly one run dir remains on disk.
  *
  * Run compaction EXCLUSIVELY (no concurrent writer into the same outDir):
  * like Iceberg's maintenance actions, it rewrites metadata that an
  * in-flight writer would race.
  */
object Compact {

  /** Compact `outDir` into one baseline run; returns the new run id. */
  def compact(spark: SparkSession, cfg: ValidatorConfig, outDir: String,
              deleteOldRuns: Boolean = false): Long = {
    val manifestPath = cfg.manifestPath.getOrElse(
      sys.error("compaction requires a manifest (cfg.manifestPath)"))
    val m = new Manifest(manifestPath)

    // current snapshot = winner rows (committed set when available)
    val snapshot = ValidatorApp.readSnapshot(spark, cfg, outDir, Some(m))
      .cache()

    val runNum = ValidatorApp.nextRunId(outDir)
    val runId = s"run=$runNum"
    snapshot
      .withColumn("bucket", when(col("docId").isNotNull,
        pmod(xxhash64(col("docId")), lit(cfg.nBuckets)).cast("int")).otherwise(lit(-1)))
      .write.mode("overwrite").parquet(s"$outDir/violations/$runId")

    // verdicts recomputed over the full corpus (nDocs per bucket comes from
    // the documents table, exactly as a first full run would record them)
    val docs = cfg.bucketedTable
      .map(t => Layout.readBucketed(spark, t))
      .getOrElse(spark.read.parquet(cfg.documentsPath))
    Pipeline.verdictsFrom(spark, snapshot, docs, cfg.schema,
        cfg.snapshotId, cfg.nBuckets, cfg.configuredChecks)
      .write.mode("overwrite").parquet(s"$outDir/verdicts/$runId")

    // the commit: a FRESH manifest referencing only the compacted run —
    // other snapshot keys' records do not survive (one outDir = one
    // snapshot × one constraint set, the contract the readers rely on)
    val files = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$outDir/violations/$runId")))(
      _.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted)
    val stats = spark.read.parquet(s"$outDir/verdicts/$runId")
      .filter(col("partitionId") >= 0)
      .groupBy("partitionId")
      .agg(max("nDocs").as("d"), sum("nViolations").as("v"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    m.rewriteAtomically { fresh =>
      fresh.recordFiles(cfg.snapshotId, cfg.schema.constraintHash, runNum,
        files, cfg.checksHash)
      fresh.recordRun(cfg.snapshotId, cfg.schema.constraintHash, stats.toSeq,
        cfg.checksHash, runNum)
    }
    snapshot.unpersist()

    if (deleteOldRuns) {
      Seq("violations", "verdicts").foreach { sub =>
        val parent = java.nio.file.Paths.get(s"$outDir/$sub")
        val old = scala.util.Using.resource(java.nio.file.Files.list(parent))(
          _.iterator().asScala.filter(p =>
            p.getFileName.toString.startsWith("run=") &&
              p.getFileName.toString != runId).toSeq)
        old.foreach { dir =>
          scala.util.Using.resource(java.nio.file.Files.walk(dir))(
            _.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.delete(p)))
        }
      }
    }
    runNum
  }
}
