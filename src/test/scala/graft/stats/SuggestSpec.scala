package graft.stats

import graft.SparkTestBase

/** Constraint suggestion: exact expected suggestion sets on a hand-built
  * frame exercising every rule and its negation.
  */
class SuggestSpec extends SparkTestBase {

  private def frame() = {
    val session = spark
    import session.implicits._
    // id: unique, not-null, numeric, categorical (4 ≤ max)
    // cat: not-null, 2 values (categorical, NOT unique)
    // leaky: has a null → no not_null; 3 distinct non-null = 3 rows' worth
    // score: numeric with nulls
    Seq(
      (1L, "a", Option("x"), Option(2.5)),
      (2L, "b", Option("y"), None),
      (3L, "a", None, Option(7.5)),
      (4L, "b", Option("z"), Option(2.5))
    ).toDF("id", "cat", "leaky", "score")
  }

  test("exact mode: every rule and its negation") {
    val got = Suggest.suggestConstraints(frame(), categoricalMax = 4,
        approx = false)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    val exp = Set(
      ("id", "not_null", ""), ("id", "unique", ""),
      ("id", "is_in", "1|2|3|4"), ("id", "range", "[1,4]"),
      ("cat", "not_null", ""), ("cat", "is_in", "a|b"),
      // leaky: null kills not_null; 3 distinct of 3 non-null → unique
      ("leaky", "unique", ""), ("leaky", "is_in", "x|y|z"),
      // score: null kills not_null; 2.5 repeats so not unique
      ("score", "is_in", "2.5|7.5"), ("score", "range", "[2.5,7.5]"))
    assert(got == exp)
  }

  test("categoricalMax gates is_in") {
    val got = Suggest.suggestConstraints(frame(), categoricalMax = 2,
        approx = false)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("cat", "is_in")))       // 2 values ≤ 2
    assert(!got.contains(("id", "is_in")))       // 4 values > 2
    assert(!got.contains(("leaky", "is_in")))    // 3 values > 2
  }

  test("verifyConstraints: planted violations counted exactly; suggest→verify round-trips clean") {
    val df = frame()
    val got = Suggest.verifyConstraints(df, Seq(
        ("id", "not_null", ""), ("id", "unique", ""),
        ("cat", "is_in", "a"),            // 2 'b' rows violate
        ("leaky", "not_null", ""),        // 1 null violates
        ("score", "range", "[3,10]"),     // two 2.5s violate
        ("score", "unique", "")))         // duplicate 2.5 → 1 excess row
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(3), r.getString(4))))
      .toMap
    assert(got(("id", "not_null")) == ((0L, "pass")))
    assert(got(("id", "unique")) == ((0L, "pass")))
    assert(got(("cat", "is_in")) == ((2L, "fail")))
    assert(got(("leaky", "not_null")) == ((1L, "fail")))
    assert(got(("score", "range")) == ((2L, "fail")))
    assert(got(("score", "unique")) == ((1L, "fail")))
    // everything suggestConstraints proposes holds on the frame it saw
    val suggested = Suggest.suggestConstraints(df, 4, approx = false)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val verified = Suggest.verifyConstraints(df, suggested.toSeq)
    assert(verified.filter(org.apache.spark.sql.functions
      .col("status") === "fail").count() == 0L)
  }

  test("unknown constraint kind fails fast") {
    intercept[IllegalArgumentException] {
      Suggest.verifyConstraints(frame(), Seq(("id", "positive", "")))
    }
  }

  test("approx mode emits the same kinds on a tiny frame (HLL exact at low cardinality)") {
    val exact = Suggest.suggestConstraints(frame(), 4, approx = false)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val appr = Suggest.suggestConstraints(frame(), 4, approx = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(appr == exact)
  }
}
