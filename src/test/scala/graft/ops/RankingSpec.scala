package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RankingSpec extends SparkTestBase {

  test("termCounts/docFrequencies: canonical tokens, exact tf and df") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      (1L, "The cat sat. the CAT!"),  // canonical: "the cat sat. the cat!"
      (2L, "a cat"),
      (3L, "   ")).toDF("doc_id", "text")
    val tc = Ranking.termCounts(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // "cat!" ≠ "cat" (punctuation is part of the token; canonicalization
    // only lowercases and collapses whitespace)
    assert(tc == Map((1L, "the") -> 2L, (1L, "cat") -> 1L, (1L, "sat.") -> 1L,
      (1L, "cat!") -> 1L, (2L, "a") -> 1L, (2L, "cat") -> 1L), s"got $tc")
    val df = Ranking.docFrequencies(Ranking.termCounts(docs)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("cat") == 2L && df("the") == 1L, s"got $df")
  }

  test("tfidf: rarer term outweighs common term at equal tf; tf scales linearly") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      (1L, "common rare"), (2L, "common other"), (3L, "common more")
    ).toDF("doc_id", "text")
    val scored = Ranking.tfidf(docs, 3L).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(scored((1L, "rare")) > scored((1L, "common")),
      s"df=1 must outweigh df=3 at tf=1: $scored")
    // exact formula check: tf·(ln((N+1)/(df+1))+1)
    val exp = 1.0 * (math.log(4.0 / 2.0) + 1.0)
    assert(scored((1L, "rare")) == exp, s"${scored((1L, "rare"))} != $exp")
  }

  test("bm25 + topTerms: saturation in tf, length normalization, stable tie-break") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      (1L, "x x x x y"),          // tf(x)=4 in a 5-token doc
      (2L, "x y z w v"),          // tf(x)=1 in a 5-token doc
      (3L, "q q q q q q q q q q") // long doc of a unique term
    ).toDF("doc_id", "text")
    val n = docs.count()
    val tc = Ranking.termCounts(docs)
    val avgLen = tc.agg(sum("tf")).collect()(0).getLong(0).toDouble / n
    val scored = Ranking.bm25(docs, n, avgLen)
    val byKey = scored.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    // more occurrences score higher, but sublinearly (k1 saturation)
    assert(byKey((1L, "x")) > byKey((2L, "x")))
    assert(byKey((1L, "x")) < 4.0 * byKey((2L, "x")),
      "bm25 must saturate below linear tf scaling")
    // topTerms: rank 1 for doc 1 is x; ties (same tf/df) break on term asc
    val top = Ranking.topTerms(scored, 2, score = "bm25")
      .filter(col("doc_id") === 2L).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getInt(6)))
    // doc 2: all terms tf=1; x and y have df=2 (lower idf), v/w/z df=1 tie
    // on score → term asc picks v then w
    assert(top.toSeq == Seq(("v", 1), ("w", 2)), s"got ${top.toSeq}")
  }

  test("heavyHitterTerms: MG prefilter + exact verify equals the full group-count at the bound") {
    val session = spark
    import session.implicits._
    // 3 heavy terms (600/500/450 occurrences) in a sea of 2000 singletons,
    // spread over 16 partitions so the sketch actually MERGES partials;
    // N = 3550, k = 16 → completeness bound N/(k+1) ≈ 209
    val words = Seq.fill(600)("alpha") ++ Seq.fill(500)("beta") ++
      Seq.fill(450)("gamma") ++ (0 until 2000).map(i => s"noise$i")
    val docs = words.grouped(25).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(16)
    val got = Ranking.heavyHitterTerms(docs, minCount = 300L, k = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("alpha" -> 600L, "beta" -> 500L, "gamma" -> 450L),
      s"got $got")
    // counts are TRUE counts (verify pass), not MG underestimates
    assert(got.values.sum == 1550L)
    // raising the threshold past a heavy term's count drops exactly it
    val strict = Ranking.heavyHitterTerms(docs, minCount = 460L, k = 16)
      .collect().map(_.getString(0)).toSet
    assert(strict == Set("alpha", "beta"), s"got $strict")
  }

  test("HeavyHittersAgg: MG guarantee — every >N/(k+1) item present, estimates within the bound") {
    val session = spark
    import session.implicits._
    val items = (Seq.fill(120)("hot") ++ (0 until 200).map(i => s"cold$i"))
    val df = items.toDF("term").repartition(8)
    val hh = df.agg(graft.functions.HeavyHittersAgg.heavyHitters(col("term"), 4).as("h"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh.size <= 4)
    // N = 320, k = 4 → bound 64; "hot" (120) must be present with an
    // estimate within [120 - 64, 120]
    assert(hh.contains("hot"), s"got $hh")
    assert(hh("hot") <= 120L && hh("hot") >= 120L - 64L, s"got ${hh("hot")}")
  }
}
