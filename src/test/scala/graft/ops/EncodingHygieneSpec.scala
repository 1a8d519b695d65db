package graft.ops

import graft.SparkTestBase
import graft.functions.NfcNormalize
import org.apache.spark.sql.functions._

/** All non-ASCII fixture characters are constructed from code points so no
  * editor / tooling normalization can silently change what the test feeds
  * the engine (a raw decomposed literal is one save-hook away from being
  * composed).
  */
class EncodingHygieneSpec extends SparkTestBase {

  private def cp(c: Int): String = new String(Character.toChars(c))

  private val Acute = cp(0x0301)     // combining acute
  private val Ring = cp(0x030A)      // combining ring above
  private val Overline = cp(0x0305)  // combining overline: never composes
  private val EAcute = cp(0x00E9)    // precomposed e-acute
  private val ARing = cp(0x00C5)     // precomposed A-ring
  private val Fffd = cp(0xFFFD)      // replacement char
  private val Emoji = cp(0x1F600)    // astral-plane grinning face

  test("nfc: composes decomposed sequences, matches java.text.Normalizer, leaves NFC text unchanged") {
    val session = spark
    import session.implicits._
    val decomposed = s"cafe$Acute A$Ring"
    val noCompose = s"a$Overline"
    val texts = Seq(decomposed, noCompose, "plain ascii", s"de${Acute}ja vu")
    val got = texts.toDF("t")
      .select(col("t"), NfcNormalize.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    texts.foreach { t =>
      val exp = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      assert(got(t) == exp, s"input codepoints ${t.codePoints.toArray.toSeq}")
    }
    assert(got(decomposed) == s"caf$EAcute $ARing")
    assert(got(decomposed).length == decomposed.length - 2)
    assert(got(noCompose) == noCompose)
  }

  test("nfc: astral-plane characters survive (no surrogate splitting)") {
    val session = spark
    import session.implicits._
    val text = s"ok $Emoji e${Acute}nd"
    val out = Seq(text).toDF("t")
      .select(NfcNormalize.nfcNormalize(col("t"))).collect()(0).getString(0)
    assert(out == s"ok $Emoji ${EAcute}nd", out.codePoints.toArray.toSeq.toString)
  }

  test("nfc: null-safe and codegen (no CodegenFallback in the projection)") {
    val session = spark
    import session.implicits._
    val df = Seq(Some(EAcute), None).toDF("t")
      .select(NfcNormalize.nfcNormalize(col("t")).as("n"))
    val rows = df.collect()
    assert(rows(0).getString(0) == EAcute && rows(1).isNullAt(0))
    assert(!df.queryExecution.executedPlan.toString.contains("Fallback"),
      df.queryExecution.executedPlan.toString)
  }

  test("badCharCount + stripControlChars: exact over seeded damage; tab/LF/CR preserved") {
    val session = spark
    import session.implicits._
    // damage: NUL, BS, VT, DEL, U+FFFD (5 hits); tab/LF/CR must survive
    val dirty = s"a${cp(0x00)}b${cp(0x08)}c${cp(0x0B)}d${cp(0x7F)}e${Fffd}f\tg\nh\ri"
    val got = Seq(dirty).toDF("t")
      .select(TextAnalysis.badCharCount(col("t")).as("n"),
        TextAnalysis.stripControlChars(col("t")).as("s"))
      .collect()(0)
    assert(got.getInt(0) == 5, s"n_bad=${got.getInt(0)}")
    assert(got.getString(1) == "abcdef\tg\nh\ri", got.getString(1))
  }
}
