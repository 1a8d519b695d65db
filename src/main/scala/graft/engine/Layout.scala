package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers (SURVEY.md §4.1): bucketing the corpus by doc_id
  * co-locates the referential joins — the doc_id universe side of the
  * URI-existence anti-join and the target-class join reads pre-hashed
  * buckets with NO shuffle and no sort (bucketed scan reports
  * HashPartitioning), leaving only the (much smaller, deduplicated) probe
  * side to shuffle. At 10^12 docs this removes the largest exchange in the
  * pipeline.
  */
object Layout {

  /** Write the docs as a bucketed+sorted table (Parquet, session catalog).
    * `buckets` should match the cluster's reduce parallelism scale.
    */
  def writeBucketed(docs: DataFrame, table: String, buckets: Int): Unit =
    docs.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, "doc_id")
      .sortBy("doc_id")
      .saveAsTable(table)

  /** Read a bucketed corpus table. */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
