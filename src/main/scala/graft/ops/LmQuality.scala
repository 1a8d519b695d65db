package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Language-model quality scoring — the CCNet-style perplexity filter,
  * self-contained (zero external data): train a character-bigram model on
  * a reference slice of the corpus itself (or any in-domain reference
  * table), then score every document by its mean per-gram conditional
  * log-probability. Low scores flag boilerplate, encoding garbage, and
  * non-prose — the third leg of the quality triad next to the heuristic
  * signals ([[TextAnalysis.qualityScore]]) and repetition
  * ([[TextAnalysis.distinctWordRatioE6]]).
  *
  * Scale shape: the model is tiny (|alphabet|² entries) and broadcasts;
  * scoring is explode → broadcast-join → per-doc aggregate — one shuffle
  * on doc id, no all-pairs anything. Gram generation is the native
  * codegen'd [[graft.functions.CharNgrams]] (multiplicity-preserving; the
  * HOF formulation is the documented anti-pattern on full-corpus passes).
  */
object LmQuality {

  /** Canonical modeling text — the ONE canonical form shared with the
    * dedup fingerprints ([[TextAnalysis.canonicalText]]), so the LM
    * features and the dedup keys cannot silently diverge.
    */
  def canonical(text: Column): Column = TextAnalysis.canonicalText(text)

  def charNgrams(text: Column, n: Int = 2): Column =
    graft.functions.CharNgrams.charNgrams(canonical(text), n)

  /** Train a conditional n-gram model: rows `(g, logp)` where
    * logp = log((count(g) + 1) / (count(ctx·) + branches(ctx))) — add-one
    * smoothing over each context's OBSERVED branch set (unseen grams get
    * the caller-side floor at scoring time). `ctx` = the gram's first
    * n−1 chars.
    */
  def train(reference: DataFrame, text: String = "text", n: Int = 2): DataFrame = {
    val grams = reference
      .select(explode(charNgrams(col(text), n)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .withColumn("ctx", substring(col("g"), 1, n - 1))
    val totals = grams.groupBy("ctx")
      .agg(sum("cnt").as("ctxTotal"), count(lit(1)).as("branches"))
    grams.join(totals, "ctx")
      .select(col("g"),
        log((col("cnt") + lit(1.0)) / (col("ctxTotal") + col("branches"))).as("logp"))
  }

  /** Mean per-gram conditional log-prob per document (higher = more like
    * the reference); docs with no grams (shorter than n chars) are absent.
    * Unseen grams score strictly BELOW every seen gram: the effective
    * floor is min(`floorLogp`, model minimum − ln 2). A fixed floor alone
    * inverts the ranking once a reference context grows past ~1/e^floor
    * occurrences — the rarest SEEN grams would then score below never-seen
    * encoding garbage, the exact inputs the filter exists to catch.
    */
  def score(docs: DataFrame, model: DataFrame,
            id: String = "doc_id", text: String = "text", n: Int = 2,
            floorLogp: Double = math.log(1e-6)): DataFrame = {
    // Empty model (reference slice had no text of length >= n): every gram
    // is unseen, so the fixed floor alone is the whole model. Guarding here
    // turns what would be an opaque NPE (getDouble on a null MIN) into the
    // documented degenerate behavior.
    val minRow = model.agg(min(col("logp"))).collect()(0)
    val effFloor =
      if (minRow.isNullAt(0)) floorLogp
      else math.min(floorLogp, minRow.getDouble(0) - math.log(2))
    docs.select(col(id), explode(charNgrams(col(text), n)).as("g"))
      .join(broadcast(model), Seq("g"), "left")
      .groupBy(col(id))
      .agg(avg(coalesce(col("logp"), lit(effFloor))).as("lm_score"),
        count(lit(1)).as("n_grams"))
  }
}
