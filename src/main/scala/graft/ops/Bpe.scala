package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a corpus — the tokenizer-training
  * stage of an LLM data pipeline (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units").
  *
  * Scale shape: the ONLY corpus-scale stage is [[wordFreqs]] (one explode +
  * one group-count, map-side combined). Training then runs on the
  * vocab-sized word-frequency table (10^5–10^6 rows for any corpus, since
  * vocabulary grows ~ sqrt of corpus size), so each merge round costs a
  * vocab-table pair-count plus a driver-side top-1 — independent of corpus
  * size. Encoding a 10^12-doc corpus with the trained merges is likewise a
  * vocab join, not a per-document merge loop: [[segmentVocab]] applies all
  * merges to the small vocab table once, and [[encode]] broadcast-joins the
  * corpus's words against that segmentation.
  *
  * Symbols are characters, optionally closed by Sennrich's `</w>`
  * end-of-word marker (`endOfWord = true` appends [[Bpe.EndOfWord]] as a
  * trailing symbol, letting merges learn word-FINAL units like `d</w>`;
  * default off preserves the marker-free training runs and their
  * cross-engine oracles). Pair counting counts every adjacent occurrence;
  * merge application is left-to-right non-overlapping — both exactly as
  * in the reference implementation.
  */
object Bpe {

  /** Sennrich's end-of-word marker symbol. Multi-char, so it can never
    * collide with the single-char initial symbols.
    */
  val EndOfWord = "</w>"

  /** Word-frequency table of the corpus: lower-cased `\S+` runs. The one
    * corpus-scale stage; everything downstream is vocab-sized.
    */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbolization: each word as its character array, plus the
    * trailing `</w>` symbol when `endOfWord` is on.
    */
  def charSyms(word: Column, endOfWord: Boolean = false): Column = {
    val chars = filter(split(word, ""), x => x =!= "")
    if (endOfWord) concat(chars, array(lit(EndOfWord))) else chars
  }

  /** Adjacent-pair counts over the current symbolization, weighted by word
    * frequency (every adjacent occurrence counts, the Sennrich get_stats
    * semantics). `words` needs (syms: array&lt;string&gt;, freq: long).
    */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Left-to-right non-overlapping application of one merge (l, r) → lr to
    * a symbol array: a per-row fold (interpreted HOF — fine here because it
    * only ever runs over the vocab-sized table, never the corpus).
    */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Train `nMerges` merges: each round counts pairs over the vocab table,
    * takes the (cnt desc, l, r) argmax (a one-row driver collect — the same
    * scalar-per-round trade as PageRank's dangling mass), and applies it.
    * Ties break lexicographically, so training is fully deterministic.
    * Returns (rank, left, right, cnt) — empty tail if the vocab merges dry.
    */
  def train(wordFreqs: DataFrame, nMerges: Int,
            endOfWord: Boolean = false): Seq[(Int, String, String, Long)] = {
    var words = wordFreqs
      .select(col("word"), col("freq"), charSyms(col("word"), endOfWord).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var dry = false
    for (k <- 1 to nMerges if !dry) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((k, l, r, c))
        words = words.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** The trained merge table as a DataFrame (rank, left, right, cnt). */
  def trainDF(wordFreqs: DataFrame, nMerges: Int,
              endOfWord: Boolean = false): DataFrame = {
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    train(wordFreqs, nMerges, endOfWord).toDF("rank", "left", "right", "cnt")
  }

  /** Segmentation of each vocab word under the trained merges, applied in
    * rank order (a chain of nMerges vocab-table folds — still vocab-sized).
    * `endOfWord` must match the training-time setting or word-final merges
    * can never fire.
    */
  def segmentVocab(wordFreqs: DataFrame, merges: Seq[(Int, String, String, Long)],
                   endOfWord: Boolean = false): DataFrame =
    merges.foldLeft(
      wordFreqs.select(col("word"), charSyms(col("word"), endOfWord).as("syms"))) {
      case (df, (_, l, r, _)) => df.withColumn("syms", applyMerge(col("syms"), l, r))
    }

  /** Encode a corpus with the trained merges: explode words, broadcast-join
    * the vocab segmentation, re-assemble per-document token arrays. OOV
    * words (absent from the training vocab) fall back to their character
    * split. This is the 10^12-doc path: the merge folds never touch the
    * corpus, only the broadcast vocab.
    */
  def encode(docs: DataFrame, seg: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             endOfWord: Boolean = false): DataFrame = {
    val words = docs.select(col(idCol),
        posexplode(regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0)))
          .as(Seq("pos", "word")))
    words.join(broadcast(seg), Seq("word"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("syms"), charSyms(col("word"), endOfWord)).as("syms"))
      .groupBy(idCol)
      .agg(flatten(transform(array_sort(collect_list(struct(col("pos"), col("syms")))),
        s => s.getField("syms"))).as("tokens"))
  }
}
