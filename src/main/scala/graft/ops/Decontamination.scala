package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag (or drop) training
  * documents that share word n-grams with an evaluation set — the
  * GPT-3-style 13-gram overlap filter.
  *
  * Scale shape: the BENCHMARK side is eval-set sized (thousands of docs),
  * so its distinct-gram set broadcasts; the corpus side then never
  * shuffles — contamination detection over 10^12 documents is a map-only
  * broadcast semi/inner join on the gram key. Grams are matched as strings
  * (exact, cross-engine checkable); swap in `xxhash64(g)` on both sides if
  * the broadcast needs to shrink.
  */
object Decontamination {

  /** Distinct word n-grams of a text (documents shorter than n words
    * contribute their whole token sequence as one gram) — the native
    * codegen'd [[graft.functions.WordNgrams]] expression: this runs over
    * the FULL corpus, where the interpreted HOF formulation is the
    * documented anti-pattern (CodegenFallback, per-element interpretation).
    */
  def ngrams(text: Column, n: Int): Column =
    graft.functions.WordNgrams.wordNgrams(text, n)

  /** Corpus docs sharing at least one n-gram with the benchmark:
    * (id, n_shared) where n_shared counts the doc's DISTINCT overlapping
    * grams.
    *
    * `broadcastBenchmark` (default true) is the escape hatch for an
    * oversized benchmark side (round-3 advice): eval sets are normally
    * thousands of docs and their gram set broadcasts — the map-only,
    * no-corpus-shuffle shape — but a caller feeding a corpus-sized
    * "benchmark" can pass false to get a shuffle join instead of a
    * driver/executor OOM from a forced broadcast.
    */
  def contaminated(corpus: DataFrame, benchmark: DataFrame, n: Int = 13,
                   id: String = "doc_id", text: String = "text",
                   broadcastBenchmark: Boolean = true): DataFrame =
    sharedGramEvents(corpus, benchmark, n, id, text, broadcastBenchmark)
      .groupBy(col(id)).agg(count(lit(1)).as("n_shared"))

  /** The event-level core both the batch operator and its streaming twin
    * ([[graft.streaming.StreamingValidator.contaminationEventStream]])
    * derive from — ONE body, so gram normalization or join-shape changes
    * cannot silently diverge them: `(id, g)` for every distinct n-gram a
    * corpus doc shares with the benchmark set. Stateless (no aggregation),
    * which is what makes the streaming use append-legal.
    */
  def sharedGramEvents(corpus: DataFrame, benchmark: DataFrame, n: Int = 13,
                       id: String = "doc_id", text: String = "text",
                       broadcastBenchmark: Boolean = true): DataFrame = {
    val cg = corpus.select(col(id), explode(ngrams(col(text), n)).as("g"))
    val bg = benchmark.select(explode(ngrams(col(text), n)).as("g")).distinct()
    cg.join(if (broadcastBenchmark) broadcast(bg) else bg, Seq("g"))
      .select(col(id), col("g"))
  }

  /** Corpus with contaminated documents removed. */
  def clean(corpus: DataFrame, benchmark: DataFrame, n: Int = 13,
            id: String = "doc_id", text: String = "text",
            broadcastBenchmark: Boolean = true): DataFrame =
    corpus.join(
      contaminated(corpus, benchmark, n, id, text, broadcastBenchmark).select(id),
      Seq(id), "left_anti")
}
