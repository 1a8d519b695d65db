package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Exact duplicated-passage removal: hand-verified cuts on a k=3 fixture
  * (every expected string below is worked out by hand from the operator's
  * contract — duplicated k-gram windows are cut everywhere but the
  * smallest (id, pos) occurrence, survivors rejoin with single spaces).
  */
class PassageDedupSpec extends SparkTestBase {

  private def fixture = {
    val session = spark
    import session.implicits._
    Seq(
      0L -> "a b c d e f",          // holds the keeper occurrence of "c d e"
      1L -> "x y c d e z",          // shares "c d e" → cut
      2L -> "p q r s",              // nothing shared → verbatim
      3L -> "m n o m n o m n o",    // intra-doc repetition
      4L -> "u v g h i j w",        // holds keeper of passage "g h i j"
      5L -> "s t g h i j q",        // shares the 4-token passage → cut
      6L -> "c d e",                // IS a duplicated gram → fully cut
      7L -> "z z"                   // shorter than k → no grams, verbatim
    ).toDF("doc_id", "text")
  }

  test("keepOne: duplicated spans cut from all but the first occurrence, token-exact") {
    val got = Dedup.passageDedup(fixture, k = 3)
      .select("doc_id", "text", "cut_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got(0L) == ("a b c d e f", 0))  // keeper doc untouched
    assert(got(1L) == ("x y z", 3))        // passage cut, unique context kept
    assert(got(2L) == ("p q r s", 0))
    // "m n o" starts at 0,3,6; "n o m" at 1,4; "o m n" at 2,5 — keepers are
    // the pos-0/1/2 occurrences, every later window [3,6)+[4,7)+[5,8)+[6,9)
    // is cut → positions 3..8 go, first period stays
    assert(got(3L) == ("m n o", 6))
    assert(got(4L) == ("u v g h i j w", 0))
    // dup grams "g h i"+"h i j" union to the exact 4-token passage [2,6)
    assert(got(5L) == ("s t q", 4))
    assert(got(6L) == ("", 3))             // whole doc was the passage
    assert(got(7L) == ("z z", 0))          // < k tokens: never a passage
  }

  test("C4-style keepOne=false cuts every occurrence, keeper included") {
    val got = Dedup.passageDedup(fixture, k = 3, keepOne = false)
      .select("doc_id", "text", "cut_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got(0L) == ("a b f", 3))
    assert(got(1L) == ("x y z", 3))
    assert(got(3L) == ("", 9))             // every window duplicated → all cut
    assert(got(4L) == ("u v w", 4))
    assert(got(5L) == ("s t q", 4))
    assert(got(6L) == ("", 3))
    assert(got(7L) == ("z z", 0))
  }

  test("only the keeper's text survives once corpus-wide; total tokens conserved") {
    val before = fixture.select(sum(size(split(col("text"), " "))).as("n"))
      .collect()(0).getLong(0)
    val after = Dedup.passageDedup(fixture, k = 3)
    val counts = after.select(
      sum(size(split(col("text"), " ")) - when(col("text") === "", 1).otherwise(0)).as("kept"),
      sum(col("cut_tokens")).as("cut")).collect()(0)
    assert(counts.getLong(0) + counts.getLong(1) == before,
      s"kept ${counts.getLong(0)} + cut ${counts.getLong(1)} != $before")
  }

  test("preserveWhitespace: cuts are char-faithful — all whitespace bytes survive, the two forms differ") {
    val session = spark
    import session.implicits._
    // mixed whitespace: tabs, double spaces, leading/trailing — the shared
    // passage "c d e" is cut from doc 21 (keeper 20); every whitespace byte
    // of the survivors must remain, the cut tokens' own chars vanish
    val df = Seq(
      20L -> "a b c d e f",             // keeper occurrence of "c d e"
      21L -> " x\ty  c d\te z ",        // shares "c d e" → chars of c,d,e cut
      22L -> "p\t\tq  r"                // untouched: verbatim incl. tabs
    ).toDF("doc_id", "text")
    val chars = Dedup.passageDedup(df, k = 3, preserveWhitespace = true)
      .select("doc_id", "text", "cut_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(chars(20L) == ("a b c d e f", 0))
    // " x\ty  c d\te z " minus the c/d/e token chars, gaps verbatim
    assert(chars(21L) == (" x\ty   \t z ", 3), chars(21L).toString)
    assert(chars(22L) == ("p\t\tq  r", 0))
    // the token-rejoin twin normalizes the survivors' whitespace — the two
    // forms genuinely differ on this plant
    val toks = Dedup.passageDedup(df, k = 3)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(toks(21L) == "x y z")
    assert(toks(21L) != chars(21L)._1)
    // and on strictly single-spaced text the char form leaves the residue
    // of the cut (double space), the token form closes it
    val sp = Seq(30L -> "a b c d e f", 31L -> "w c d e v").toDF("doc_id", "text")
    val c31 = Dedup.passageDedup(sp, k = 3, preserveWhitespace = true)
      .filter(col("doc_id") === 31L).select("text").collect()(0).getString(0)
    assert(c31 == "w    v", s"'$c31'")
  }

  test("original non-text columns pass through; untouched docs keep text verbatim") {
    val session = spark
    import session.implicits._
    // a doc with a DOUBLE space: untouched docs must keep it byte-for-byte
    val df = Seq((10L, "aa  bb", "s0"), (11L, "q r s t u", "s1"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.passageDedup(df, k = 3).orderBy("doc_id").collect()
    assert(got(0).getString(1) == "aa  bb" && got(0).getString(2) == "s0")
    assert(got(1).getString(1) == "q r s t u" && got(1).getString(2) == "s1")
  }
}
