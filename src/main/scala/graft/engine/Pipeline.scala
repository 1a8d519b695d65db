package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.checks.{CheckContext, Checks, ConstraintCheck, RowLocalCheck}
import graft.model.SchemaDef

/** Pipeline runner — the Spark-native equivalent of the reference's check
  * loop (dvt:139-192), except checks compose into plans instead of running
  * sequential HTTP queries, and verdicts are computed per logical partition.
  *
  * Logical partitioning: `bucket = pmod(xxhash64(doc_id), nBuckets)` — a
  * data-defined, layout-independent partition key. Verdicts and the resume
  * manifest are keyed by it, so a resumed run over the same snapshot skips
  * buckets regardless of how the files were split (Iceberg-snapshot-style
  * semantics without the Iceberg runtime; see SURVEY.md §4.5).
  */
object Pipeline {

  val DefaultBuckets = 64

  /** docs + a `bucket` column. Hashes the CANONICAL (string-cast) form of
    * doc_id: violation rows and verdicts carry `docId` as a string, so every
    * bucket derivation in the system must hash the same bytes — a non-string
    * doc_id hashed in its native type would land in a different bucket than
    * its own violations (xxhash64 of long ≠ xxhash64 of its decimal string).
    */
  def withBucket(docs: DataFrame, nBuckets: Int = DefaultBuckets): DataFrame =
    docs.withColumn("bucket",
      pmod(xxhash64(col("doc_id").cast("string")), lit(nBuckets)).cast("int"))

  /** Run the given checks; returns the union of violation rows.
    * Dataset-level violations (no docId) come out with docId null.
    *
    * When `fused` (default), all [[graft.checks.RowLocalCheck]]s evaluate in
    * ONE shared scan: their per-row violation arrays concatenate into a
    * single projection exploded once — subject-local validation of the whole
    * constraint set costs one pass over the table regardless of how many
    * checks are configured (the reference made 1-3 HTTP queries per
    * property/restriction). Non-row-local checks (vocabulary distincts,
    * referential joins) keep their own minimal-ReadSchema scans.
    */
  def violations(spark: SparkSession, docs: DataFrame, schema: SchemaDef,
                 checks: Seq[ConstraintCheck] = Checks.all,
                 fused: Boolean = true,
                 native: Boolean = true,
                 universe: Option[DataFrame] = None): DataFrame = {
    val ctx = CheckContext(spark, docs, schema, universe)
    val (rowLocal, others) = checks.partition(c => fused && c.isInstanceOf[RowLocalCheck])

    val fusedFrames: Seq[DataFrame] =
      if (rowLocal.isEmpty) Nil
      else {
        val one =
          if (native) {
            // the native single-pass expression: compiled validators,
            // primitive counters, one output array — codegen'd end to end.
            // Strictness and the optional span-datatype layout flow in from
            // the configured check / the corpus schema (the datatype seam).
            val strictDt = rowLocal.exists {
              case c: graft.checks.CheckDatatypeImpl => c.strict
              case _ => false
            }
            val cc = graft.functions.CompiledConstraints.from(
              schema, rowLocal.map(_.id).toSet,
              strictDt = strictDt,
              spanArity = ctx.spanArity,
              dtOrdinal = ctx.spanDatatypeOrd)
            docs.select(col("doc_id"),
              explode(graft.functions.ValidateSpans.validateSpans(col("spans"), cc)).as("v"))
              .select(col("v.checkId").as("checkId"), lit("error").as("severity"),
                col("doc_id").cast("string").as("docId"), col("v.kind").as("kind"),
                col("v.value").as("value"), col("v.expected").as("expected"),
                col("v.check").as("check"))
          } else {
            // HOF formulation (kept as the reference semantics oracle)
            val tagged = rowLocal.map { c =>
              transform(c.asInstanceOf[RowLocalCheck].violArray(ctx), v => struct(
                v.getField("checkId").as("checkId"), v.getField("kind").as("kind"),
                v.getField("value").as("value"), v.getField("expected").as("expected"),
                lit(c.id).as("check")))
            }
            docs.select(col("doc_id"), explode(concat(tagged: _*)).as("v"))
              .select(col("v.checkId").as("checkId"), lit("error").as("severity"),
                col("doc_id").cast("string").as("docId"), col("v.kind").as("kind"),
                col("v.value").as("value"), col("v.expected").as("expected"),
                col("v.check").as("check"))
          }
        val extras = rowLocal.flatMap(c =>
          c.asInstanceOf[RowLocalCheck].extraFrames(ctx)
            .map(_.withColumn("check", lit(c.id))))
        one +: extras
      }

    val otherFrames = others.map(c => c.run(ctx).withColumn("check", lit(c.id)))
    (fusedFrames ++ otherFrames).reduce(_ unionByName _)
  }

  /** Per-bucket, per-check verdicts (north rule: per-partition pass/fail +
    * metrics + lineage). Doc-level violations roll up by bucket; dataset-
    * level violations (docId null) roll up into bucket -1.
    */
  def verdicts(spark: SparkSession, docs: DataFrame, schema: SchemaDef,
               snapshotId: String,
               nBuckets: Int = DefaultBuckets,
               checks: Seq[ConstraintCheck] = Checks.all): DataFrame =
    verdictsFrom(spark, violations(spark, docs, schema, checks), docs, schema,
      snapshotId, nBuckets, checks)

  /** [[verdicts]] over an ALREADY-COMPUTED violations frame — callers that
    * have just materialized (or cached) `violations` roll it up without
    * paying the whole validation pipeline a second time.
    */
  def verdictsFrom(spark: SparkSession, violations: DataFrame, docs: DataFrame,
                   schema: SchemaDef, snapshotId: String,
                   nBuckets: Int = DefaultBuckets,
                   checks: Seq[ConstraintCheck] = Checks.all): DataFrame = {
    val viols = violations
      .withColumn("bucket",
        when(col("docId").isNotNull,
          pmod(xxhash64(col("docId")), lit(nBuckets)).cast("int")).otherwise(lit(-1)))

    val violCounts = viols.groupBy("bucket", "check")
      .agg(count(lit(1)).as("nViolations"))

    val docsPerBucket = withBucket(docs, nBuckets)
      .groupBy("bucket").agg(count(lit(1)).as("nDocs"))

    // bucket × check universe so clean buckets still get a PASS row
    import spark.implicits._
    val checkNames = checks.map(_.id).toDF("check")
    val universe = docsPerBucket
      .unionByName(Seq((-1, 0L)).toDF("bucket", "nDocs"))
      .crossJoin(broadcast(checkNames))

    universe.join(violCounts, Seq("bucket", "check"), "left")
      .select(
        col("bucket").as("partitionId"),
        col("check").as("checkId"),
        coalesce(col("nViolations"), lit(0L)).equalTo(0L).as("pass"),
        coalesce(col("nViolations"), lit(0L)).as("nViolations"),
        col("nDocs"),
        lit(snapshotId).as("snapshotId"),
        lit(schema.constraintHash).as("constraintHash"))
  }

  /** Resume filter: drop documents whose bucket is already recorded complete
    * in the manifest for this (snapshotId, constraintHash) — an anti-join on
    * the (tiny, broadcast) completed-bucket list, mirroring how an
    * Iceberg-snapshot checkpoint would prune work.
    */
  def resumable(spark: SparkSession, docs: DataFrame, manifest: Manifest,
                snapshotId: String, schema: SchemaDef,
                nBuckets: Int = DefaultBuckets,
                checksHash: String = ""): DataFrame = {
    val done = manifest.completedBuckets(snapshotId, schema.constraintHash, checksHash)
    if (done.isEmpty) docs
    else withBucket(docs, nBuckets)
      .filter(!col("bucket").isin(done.toSeq: _*))
      .drop("bucket")
  }
}
