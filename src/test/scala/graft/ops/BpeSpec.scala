package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE merge training parity against an INDEPENDENT in-test reference
  * implementation (plain Scala, sliding-pair counting, left-to-right
  * non-overlapping merge) — the golden check for the iterative argmax loop
  * that no SQL oracle can express.
  */
class BpeSpec extends SparkTestBase {

  // --- independent reference implementation (Sennrich-style, chars) ---
  private def refTrain(words: Map[String, Long], n: Int,
                       endOfWord: Boolean = false): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupBy { case (w, _) =>
        val cs = w.map(_.toString).toVector
        if (endOfWord) cs :+ Bpe.EndOfWord else cs
      }
        .map { case (syms, ws) => syms -> ws.values.sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var k = 0
    while (k < n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; Vector(l, r) <- syms.sliding(2) if syms.size >= 2)
        counts((l, r)) = counts.getOrElse((l, r), 0L) + f
      if (counts.isEmpty) k = n
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        k += 1
        out += ((k, l, r, c))
        vocab = vocab.groupBy { case (syms, _) => refMerge(syms, l, r) }
          .map { case (m, vs) => m -> vs.values.sum }
      }
    }
    out.toSeq
  }

  private def refMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.size) {
      if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) { b += (l + r); i += 2 }
      else { b += syms(i); i += 1 }
    }
    b.result()
  }

  private def corpus = {
    val session = spark
    import session.implicits._
    Seq(
      (1L, "low lower lowest low low newer newest new wider wide wide"),
      (2L, "the newest widest lowest list misses nothing the the the"),
      (3L, "aaaa aaaa aa abab ababab low lower wide wide new"))
      .toDF("doc_id", "text")
  }

  test("train ≡ independent reference implementation, 15 merges, exact") {
    val wf = Bpe.wordFreqs(corpus)
    val wordMap = wf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refTrain(wordMap, 15)
    val got = Bpe.train(wf, 15)
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
    // deterministic across runs
    assert(Bpe.train(wf, 15) == got)
  }

  test("applyMerge is left-to-right non-overlapping (the aaaa case)") {
    val session = spark
    import session.implicits._
    val r = Seq("aaaa", "aaa", "aa", "a", "baab")
      .toDF("w")
      .select(Bpe.applyMerge(Bpe.charSyms(col("w")), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(r(0) == List("aa", "aa")) // NOT aa,a,a / a,aa,a
    assert(r(1) == List("aa", "a"))
    assert(r(2) == List("aa"))
    assert(r(3) == List("a"))
    assert(r(4) == List("b", "aa", "b"))
  }

  test("encode: merges never split content; OOV falls back to chars; vocab join path") {
    val wf = Bpe.wordFreqs(corpus)
    val merges = Bpe.train(wf, 10)
    assert(merges.nonEmpty && merges.size == 10)
    val seg = Bpe.segmentVocab(wf, merges)
    // every vocab word's segmentation concatenates back to the word
    seg.collect().foreach { r =>
      assert(r.getSeq[String](1).mkString == r.getString(0), r.toString)
    }
    val session = spark
    import session.implicits._
    val docs = Seq((9L, "low wider ZZZUNSEEN aaaa")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, seg).collect()
    assert(enc.length == 1)
    val toks = enc(0).getSeq[String](1)
    // tokens re-concatenate to the lower-cased words in order
    assert(toks.mkString == "lowwiderzzzunseenaaaa")
    // OOV word came out as single chars (no trained unit matches zzzunseen)
    assert(toks.containsSlice("zzzunseen".map(_.toString)))
  }

  test("encode under a fixed merge list: rank-order cascades + non-overlap") {
    val session = spark
    import session.implicits._
    // the q_bpe_encode merge list: (th,e) cascades on (t,h); (sc,an) on
    // (s,c)+(a,n); (q,q) never fires
    val merges = Seq(
      (1, "t", "h", 0L), (2, "th", "e", 0L), (3, "e", "r", 0L),
      (4, "o", "r", 0L), (5, "a", "n", 0L), (6, "s", "c", 0L),
      (7, "sc", "an", 0L), (8, "q", "q", 0L))
    val docs = Seq((1L, "the scanner thther order qqq")).toDF("doc_id", "text")
    val wf = Bpe.wordFreqs(docs)
    val enc = Bpe.encode(docs, Bpe.segmentVocab(wf, merges)).collect()
    val toks = enc(0).getSeq[String](1).toList
    assert(toks == List(
      "the", // t,h → th, then th,e → the (rank-order cascade)
      "scan", "n", "er", // s,c,a,n,n,e,r → (e,r),(a,n),(s,c) then (sc,an)
      "th", "the", "r", // thther: (t,h) fires twice non-overlapping, then
      // (th,e) merges only the SECOND th with e; (e,r) can't fire on the
      // already-fused "the" symbol
      "or", "d", "er", // order: (e,r) at rank 3 precedes (o,r) at rank 4
      "qq", "q"), // qqq: one left-to-right non-overlapping (q,q) merge
      toks.toString)
  }

  test("endOfWord marker: training learns word-FINAL units, reference parity, round-trip") {
    val wf = Bpe.wordFreqs(corpus)
    val wordMap = wf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refTrain(wordMap, 12, endOfWord = true)
    val got = Bpe.train(wf, 12, endOfWord = true)
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
    // the corpus's -est/-er suffix words must surface at least one merge
    // whose RIGHT side carries the marker (a word-final unit) — the exact
    // thing the marker-free run cannot learn
    assert(got.exists(m => m._3.endsWith(Bpe.EndOfWord)),
      s"no word-final merge in $got")
    // segmentation round-trips: concatenation minus the one trailing
    // marker re-yields the word
    val seg = Bpe.segmentVocab(wf, got, endOfWord = true)
    seg.collect().foreach { r =>
      val joined = r.getSeq[String](1).mkString
      assert(joined == r.getString(0) + Bpe.EndOfWord, r.toString)
    }
    // encode keeps OOV fallback consistent with the marker setting
    val session = spark
    import session.implicits._
    val docs = Seq((9L, "low ZZZUNSEEN")).toDF("doc_id", "text")
    val toks = Bpe.encode(docs, seg, endOfWord = true).collect()(0).getSeq[String](1)
    assert(toks.mkString == "low" + Bpe.EndOfWord + "zzzunseen" + Bpe.EndOfWord)
    // default-off path is untouched: same merges as before this option
    assert(Bpe.train(wf, 12) == refTrain(wordMap, 12))
  }

  test("trained merge ranks are 1..n with non-increasing counts on ties-free prefix") {
    val merges = Bpe.train(Bpe.wordFreqs(corpus), 8)
    assert(merges.map(_._1) == (1 to merges.size))
    // counts can rise after a merge creates a new frequent pair, but must
    // stay positive
    assert(merges.forall(_._4 > 0))
  }
}
