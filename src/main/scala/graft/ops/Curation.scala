package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed curation front door: the standard hygiene → filter →
  * dedup chain every web-corpus ingest runs, built entirely from the
  * library's own stages so the composition can never drift from its
  * parts — and, because every stage mirrors in ANSI SQL, the WHOLE
  * pipeline is hash-oracled end-to-end (q_curate).
  *
  * Stages, in order:
  *  1. hygiene (row-local, shuffle-free, one projection):
  *     NFC compose → residual-markup strip → control-char scrub;
  *  2. quality filter (row-local): ≥ `minTokens` whitespace tokens AND
  *     the lexical-diversity label;
  *  3. exact dedup (ONE window over the canonical fingerprint): keep the
  *     minimum-id row per fingerprint.
  *
  * Scale shape: stages 1–2 fuse into the scan (zero exchanges —
  * plan-asserted in CurationPlanSpec for the hygiene chain); the only
  * shuffle in the whole pipeline is the dedup window's hash exchange on
  * the fingerprint. Near-dup stages ([[Dedup.minhashDupPairs]] etc.)
  * compose after this, on the already-shrunk corpus.
  */
object Curation {

  def curate(docs0: DataFrame, minTokens: Int = 5, id: String = "doc_id",
             text: String = "text"): DataFrame = {
    // an unsplittable single-row-group source otherwise runs the whole
    // regex-heavy hygiene chain in ONE task (guide SS2.5)
    val docs = graft.engine.Skew.ensureParallelism(docs0)
    val clean = TextAnalysis.stripControlChars(
      TextAnalysis.stripMarkup(TextAnalysis.nfc(col(text))))
    // opaque: without the barrier, predicate pushdown substitutes the
    // 8-regex hygiene chain into the quality filter (three copies) and
    // moves it below the spread exchange — one task then runs all of it
    val cleaned = docs.select(col(id),
      graft.functions.Opaque.opaque(clean).as("clean"))
    val filtered = cleaned.filter(
      TextAnalysis.tokenCount(col("clean")) >= minTokens &&
        QualityClassifier.diversityLabel(col("clean")))
    Dedup.fingerprintDedup(filtered, id, "clean")
  }

  /** The curation FUNNEL: how many documents each [[curate]] stage admits
    * and why the rest dropped — the observability row an ingest operator
    * reads before anything else (a sudden n_short spike means a broken
    * extractor upstream, a n_dup_dropped spike means a crawler loop).
    * Built from the SAME stage Columns as [[curate]], so the funnel can
    * never disagree with the pipeline: `n_kept` equals `curate(...).count()`
    * by construction (distinct fingerprints among quality survivors —
    * asserted in CurationSpec).
    *
    * ONE corpus scan (the hygiene chain fused in) + one distinct-aggregate
    * exchange; all-integer, hash-oracled (`q_curate_funnel`).
    */
  def curationFunnel(docs0: DataFrame, minTokens: Int = 5, id: String = "doc_id",
                     text: String = "text"): DataFrame = {
    val docs = graft.engine.Skew.ensureParallelism(docs0)
    val clean = TextAnalysis.stripControlChars(
      TextAnalysis.stripMarkup(TextAnalysis.nfc(col(text))))
    val cleaned = docs.select(col(id),
      graft.functions.Opaque.opaque(clean).as("clean"))
    val tokOk = TextAnalysis.tokenCount(col("clean")) >= minTokens
    val divOk = QualityClassifier.diversityLabel(col("clean"))
    cleaned.agg(
        count(lit(1)).as("n_input"),
        count(when(!tokOk, 1)).as("n_short"),
        count(when(tokOk && !divOk, 1)).as("n_low_diversity"),
        count(when(tokOk && divOk, 1)).as("n_quality"),
        count_distinct(when(tokOk && divOk,
          TextAnalysis.fingerprint(col("clean")))).as("n_kept"))
      .withColumn("n_dup_dropped", col("n_quality") - col("n_kept"))
  }
}
