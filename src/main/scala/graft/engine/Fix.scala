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
  * the corpus is rewritten in ONE distributed pass. Two implementations:
  *
  *  - join path (default, scale-safe): explode spans, left-anti join the
  *    bad-URI FRAME, regroup by doc — the bad set never touches the driver,
  *    so millions of dangling refs cost a join, not a driver OOM + a
  *    megabyte literal shipped into every task (round-1 VERDICT item 6);
  *  - literal path ([[applyUriFix]]): for driver-known small sets (≤
  *    [[MaxLiteralUris]]), the row-local `array_contains` rewrite that
  *    avoids the explode/regroup entirely.
  */
object Fix {

  /** Above this many dangling URIs the literal path refuses — collect +
    * typedLit means a driver round-trip and a plan-embedded array probed
    * per span.
    */
  val MaxLiteralUris = 10000

  /** Documents with all spans referencing a bad URI removed (type spans are
    * never dropped, mirroring CheckURIExistence.php:411). Offsets of the
    * surviving spans are preserved (span-sequence equality holds on the
    * surviving subsequence). Driver-literal variant for SMALL bad sets.
    */
  def applyUriFix(spark: SparkSession, docs: DataFrame, badUris: Seq[String]): DataFrame = {
    if (badUris.isEmpty) return docs
    require(badUris.size <= MaxLiteralUris,
      s"${badUris.size} bad URIs exceed the literal-path guard ($MaxLiteralUris); " +
        "use applyUriFixJoin with the bad-URI frame instead")
    val bad = typedLit(badUris)
    docs.withColumn("spans",
      filter(col("spans"), s =>
        s.getField("kind") === SchemaDef.TypeKind ||
          s.getField("media_ref").isNull ||
          !array_contains(bad, s.getField("media_ref"))))
  }

  /** Join-path rewrite: `badUris` is a single-column DataFrame of dangling
    * refs (never collected). Spans are exploded with their position,
    * offending ones dropped with a left-anti join, and each document's
    * span array rebuilt in original order. Docs whose spans were all
    * dropped (impossible when a type span exists) survive with an empty
    * array via the final left join from the original doc list.
    */
  def applyUriFixJoin(spark: SparkSession, docs: DataFrame, badUris: DataFrame): DataFrame = {
    val bad = badUris.toDF("__bad").distinct()
    val exploded = docs.select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "s")))
    val kept = exploded.join(bad,
      col("s.media_ref") === col("__bad") &&
        col("s.kind") =!= SchemaDef.TypeKind, "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .select(col("doc_id"), expr("transform(ps, x -> x.s)").as("spans"))
    docs.select("doc_id").join(rebuilt, Seq("doc_id"), "left")
      .withColumn("spans", coalesce(col("spans"),
        array().cast(docs.schema("spans").dataType.catalogString)))
  }

  /** The deleted-triples log: (doc_id, kind, deleted_refs) of every span the
    * fix removes, grouped per doc — the reference's
    * `deletedNTriples[dataset][record][property][] = value` nested map
    * (CheckURIExistence.php:439-455) as a DataFrame. Join-based: `badUris`
    * is a frame, not a literal.
    */
  def uriFixLog(spark: SparkSession, docs: DataFrame, badUris: DataFrame): DataFrame = {
    val bad = badUris.toDF("__bad").distinct()
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") =!= SchemaDef.TypeKind && col("s.media_ref").isNotNull)
      .join(bad, col("s.media_ref") === col("__bad"), "left_semi")
      .groupBy(col("doc_id"), col("s.kind").as("kind"))
      .agg(sort_array(collect_list(col("s.media_ref"))).as("deleted_refs"))
  }

  /** Literal-path log overload for driver-known small sets. */
  def uriFixLog(spark: SparkSession, docs: DataFrame, badUris: Seq[String]): DataFrame = {
    import spark.implicits._
    uriFixLog(spark, docs, badUris.toDF("__bad"))
  }

  /** End-to-end: run the URI-existence check, fix every dangling reference,
    * and write the repaired corpus as a new snapshot directory. Returns the
    * fix log. (The snapshot-id convention mirrors createRevision(),
    * CheckURIExistence.php:429.) Fully distributed: the dangling set flows
    * from the check into the joins without a driver materialization.
    */
  def fixDanglingRefs(spark: SparkSession, docs: DataFrame,
                      schema: graft.model.SchemaDef,
                      outPath: String): DataFrame = {
    val ctx = graft.checks.CheckContext(spark, docs, schema)
    val bad = graft.checks.CheckUriExistence.run(ctx).select("value")
    val log = uriFixLog(spark, docs, bad)
    applyUriFixJoin(spark, docs, bad).write.mode("overwrite").parquet(outPath)
    log
  }
}
