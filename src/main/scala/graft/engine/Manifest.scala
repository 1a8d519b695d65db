package graft.engine

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Checkpoint/resume manifest — the TableFormat seam from SURVEY.md §4.5.
  *
  * The reference's run is all-or-nothing (a failed `dvt` run restarts from
  * scratch); the north rule requires resumable runs with per-partition
  * lineage. No Iceberg runtime jar exists in this offline environment, so
  * the default implementation is a Parquet-era "snapshot log": one
  * append-only JSONL file of completed (snapshotId, constraintHash, bucket)
  * records. Where Iceberg is available, the same interface maps onto
  * snapshot metadata — nothing else in the engine changes.
  *
  * Record format (one JSON object per line):
  *   {"snapshotId":"...","constraintHash":"...","bucket":N,
  *    "nDocs":N,"nViolations":N,"completedAt":"iso"}
  */
final class Manifest(path: String) {

  private def file = Paths.get(path)

  def completedBuckets(snapshotId: String, constraintHash: String): Set[Int] = {
    if (!Files.exists(file)) return Set.empty
    Files.readAllLines(file).asScala.iterator
      .filter(_.nonEmpty)
      .flatMap { line =>
        // minimal JSON field scrape — records are machine-written, flat,
        // and string values contain no escapes.
        def str(k: String): Option[String] =
          s""""$k":"([^"]*)"""".r.findFirstMatchIn(line).map(_.group(1))
        def num(k: String): Option[Long] =
          s""""$k":(-?\\d+)""".r.findFirstMatchIn(line).map(_.group(1).toLong)
        for {
          s <- str("snapshotId") if s == snapshotId
          h <- str("constraintHash") if h == constraintHash
          b <- num("bucket")
        } yield b.toInt
      }.toSet
  }

  def recordCompleted(snapshotId: String, constraintHash: String,
                      bucket: Int, nDocs: Long, nViolations: Long): Unit = {
    val ts = java.time.Instant.now().toString
    val line = s"""{"snapshotId":"$snapshotId","constraintHash":"$constraintHash","bucket":$bucket,"nDocs":$nDocs,"nViolations":$nViolations,"completedAt":"$ts"}""" + "\n"
    Files.createDirectories(file.getParent)
    Files.write(file, line.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Record every bucket of a finished verdict set as complete. */
  def recordRun(snapshotId: String, constraintHash: String,
                bucketStats: Seq[(Int, Long, Long)]): Unit =
    bucketStats.foreach { case (b, d, v) =>
      recordCompleted(snapshotId, constraintHash, b, d, v)
    }
}
