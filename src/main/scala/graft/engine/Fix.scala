package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.SchemaDef

/** Repair path — the `dvt --fix` equivalent. The reference implements fix
  * only for CheckURIExistence (CheckURIExistence.php:102-124): for each
  * dangling URI, fetch affected records (:335-390), drop the offending
  * triple but never rdf:type (:408-417), write a new revision (:426-433),
  * and log the deleted triples per dataset/record/property (:439-455).
  *
  * Spark-native inversion: instead of per-URI queries + per-record updates,
  * ONE pass — semi-join the corpus against the (small, broadcast) bad-URI
  * set, rewrite the spans array row-locally with `filter`, and write the
  * result as a new snapshot. The fix log is the grouped-accumulation shape
  * of the reference (SURVEY.md §2.4 A6).
  */
object Fix {

  /** Documents with all spans referencing a bad URI removed (type spans are
    * never dropped, mirroring CheckURIExistence.php:411). Offsets of the
    * surviving spans are preserved (span-sequence equality holds on the
    * surviving subsequence).
    */
  def applyUriFix(spark: SparkSession, docs: DataFrame, badUris: Seq[String]): DataFrame = {
    if (badUris.isEmpty) return docs
    val bad = typedLit(badUris)
    docs.withColumn("spans",
      filter(col("spans"), s =>
        s.getField("kind") === SchemaDef.TypeKind ||
          s.getField("media_ref").isNull ||
          !array_contains(bad, s.getField("media_ref"))))
  }

  /** The deleted-triples log: (doc_id, kind, media_ref) of every span the
    * fix removes, grouped per doc — the reference's
    * `deletedNTriples[dataset][record][property][] = value` nested map
    * (CheckURIExistence.php:439-455) as a DataFrame.
    */
  def uriFixLog(spark: SparkSession, docs: DataFrame, badUris: Seq[String]): DataFrame = {
    val bad = typedLit(badUris)
    val dropped = filter(col("spans"), s =>
      s.getField("kind") =!= SchemaDef.TypeKind &&
        s.getField("media_ref").isNotNull &&
        array_contains(bad, s.getField("media_ref")))
    docs.select(col("doc_id"), explode(dropped).as("s"))
      .groupBy(col("doc_id"), col("s.kind").as("kind"))
      .agg(collect_list(col("s.media_ref")).as("deleted_refs"))
  }

  /** End-to-end: run the URI-existence check, fix every dangling reference,
    * and write the repaired corpus as a new snapshot directory. Returns the
    * fix log. (The snapshot-id convention mirrors createRevision(),
    * CheckURIExistence.php:429.)
    */
  def fixDanglingRefs(spark: SparkSession, docs: DataFrame,
                      schema: graft.model.SchemaDef,
                      outPath: String): DataFrame = {
    val ctx = graft.checks.CheckContext(spark, docs, schema)
    val bad = graft.checks.CheckUriExistence.run(ctx)
      .select("value").distinct().collect().map(_.getString(0)).toSeq
    val log = uriFixLog(spark, docs, bad)
    applyUriFix(spark, docs, bad).write.mode("overwrite").parquet(outPath)
    log
  }
}
