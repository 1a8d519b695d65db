package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Asymmetric containment pairs: the quote/excerpt shape Jaccard-threshold
  * near-dup misses entirely. Hand-verified gram arithmetic on n=3.
  */
class ContainmentSpec extends SparkTestBase {

  private def fixture = {
    val session = spark
    import session.implicits._
    Seq(
      1L -> "a b c d e f g h",  // 6 distinct 3-grams
      2L -> "a b c d",          // prefix subset: 2 grams, both in doc 1
      3L -> "x y z w v u",      // unrelated
      4L -> "x y z w v u"       // exact dup of 3 (containment 1.0 both ways)
    ).toDF("doc_id", "text")
  }

  test("subset doc surfaces at containment 1.0; Jaccard at the same bar misses it") {
    val got = Dedup.containmentPairs(fixture, n = 3, minShared = 2, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getInt(3), r.getInt(4), r.getDouble(5), r.getDouble(6)))).toMap
    // (1,2): shared = 2 ("a b c", "b c d"); |G1|=6, |G2|=2
    assert(got((1L, 2L)) == ((2L, 6, 2, 2.0 / 6.0, 1.0)), got.toString)
    // (3,4): exact dup — 4 shared grams, 1.0 both ways
    assert(got((3L, 4L)) == ((4L, 4, 4, 1.0, 1.0)))
    assert(got.size == 2)
    // the same pair is INVISIBLE to symmetric Jaccard at 0.8 (j = 2/6)
    val jac = Dedup.ngramJaccardPairs(fixture, n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)), s"jaccard unexpectedly found the subset: $jac")
    assert(jac.contains((3L, 4L)))
  }

  test("minShared and threshold both gate; bucket cap drops degenerate grams with an audit") {
    val session = spark
    import session.implicits._
    // 30 docs sharing one hot gram: cap 10 drops its posting list
    val hot = (0 until 30).map(i => (100L + i, s"hot gram here tail$i unique$i mark$i"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(hot, n = 3, minShared = 1, threshold = 0.1,
      maxBucketSize = 10)
    assert(out.collect().isEmpty) // every shared gram rides the one hot bucket
    // minShared gates: fixture pair (1,2) has 2 shared grams
    assert(Dedup.containmentPairs(fixture, n = 3, minShared = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((3L, 4L)))
  }
}
