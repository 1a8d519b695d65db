package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source corpus accounting — the CCNet-style "what did each source
  * contribute" rollup a curation pipeline runs after every ingest: volume
  * (docs/tokens/chars), language spread, and the exact-duplicate count
  * inside each source. (Engine-native addition; at 100 TB this is the
  * report that decides which crawls/domains to keep.)
  *
  * Shape: ONE groupBy(source). The two DISTINCT aggregates (languages,
  * fingerprints) make Catalyst plan an Expand (row multiplication by the
  * number of distinct aggs) — acceptable because the expanded rows carry
  * only (source, lang) / (source, md5), not the text; the heavy columns
  * are projected away before the exchange.
  */
object CorpusReport {

  def bySource(docs: DataFrame, group: String = "source",
               text: String = "text", lang: String = "lang"): DataFrame =
    docs.groupBy(col(group))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(text))).as("n_tokens"),
        sum(length(col(text))).as("n_chars"),
        // exact integer sum / exact integer count: the division is a
        // single IEEE op on identical inputs in any engine — safe to
        // hash-compare, unlike accumulated-FP averages
        (sum(length(col(text))) / count(lit(1))).as("avg_chars"),
        countDistinct(col(lang)).as("n_langs"),
        // minuend counts only rows WITH a fingerprint: null-text docs have
        // a null fingerprint, which countDistinct excludes — a count(*)
        // minuend would tally every null-text doc as a duplicate
        (count(TextAnalysis.fingerprint(col(text))) -
          countDistinct(TextAnalysis.fingerprint(col(text)))).as("n_dup_docs"),
        count(when(col(text).isNull, lit(1))).as("n_null_text"))

  /** Multimodal span-mix report over the spans-shaped corpus: per document
    * CLASS (the first `type:` span's text, the native
    * [[graft.functions.SpanClass]] rule), exact doc counts, text/media
    * span volumes, and the distinct media-target fan-out — the balance
    * sheet an interleaved-corpus curator reads to see whether a class's
    * documents are drifting text-heavy or media-heavy and how concentrated
    * their media references are. One explode + one groupBy(class) with
    * map-side combine; all-integer (oracle `q_span_mix` over the exploded
    * fixture).
    */
  def spanMix(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.SpanClass.spanClass(
          col("spans.kind"), col("spans.text")).as("cls"),
        explode(col("spans")).as("s"))
      .groupBy("cls")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(when(col("s.text").isNotNull, 1)).as("n_text_spans"),
        count(when(col("s.media_ref").isNotNull, 1)).as("n_media_spans"),
        countDistinct(col("s.media_ref")).as("n_media_targets"))
}
