package graft.stats

import graft.SparkTestBase

/** Snapshot profile diff: hand-verified counts, null-rate shift, and
  * range-change flags across two constructed "snapshots".
  */
class ProfileDiffSpec extends SparkTestBase {

  test("per-column counts, null-rate shift, and range flags are exact") {
    val session = spark
    import session.implicits._
    // snapshot A: 4 rows, x has 1 null; snapshot B: 5 rows, x has 3 nulls
    // (the upstream-break signal) and max(v) grew (range change)
    val a = Seq((1L, Some("p"), 10.0), (2L, None, 20.0),
      (3L, Some("q"), 30.0), (4L, Some("r"), 40.0)).toDF("id", "x", "v")
    val b = Seq((1L, Some("p"), 10.0), (2L, None, 20.0), (3L, None, 30.0),
      (4L, None, 40.0), (5L, Some("z"), 99.0)).toDF("id", "x", "v")
    val got = ColumnStats.profileDiff(a, b, Seq("id", "x", "v"))
      .collect().map(r => r.getString(0) -> r).toMap

    val x = got("x")
    assert(x.getLong(1) == 3 && x.getLong(2) == 2)   // non-null counts
    assert(x.getLong(3) == 1 && x.getLong(4) == 3)   // nulls
    // shift = 3/5 - 1/4 = 0.35
    assert(x.getLong(11) == 350000L, x.toString)
    assert(x.getBoolean(12)) // min/max over strings moved (p..r vs p..z)

    val v = got("v")
    assert(v.getLong(11) == 0L)
    assert(v.getBoolean(12) && v.getString(10) == "99.0") // max_b grew
    val id = got("id")
    assert(id.getString(7) == "1" && !id.getString(8).isEmpty)
    assert(id.getBoolean(12)) // max 4 -> 5
  }

  test("empty side and all-null column degrade to zeros, not division errors") {
    val session = spark
    import session.implicits._
    val a = Seq((1L, Option.empty[String])).toDF("id", "x")
    val b = a.filter("id < 0") // empty snapshot
    val got = ColumnStats.profileDiff(a, b, Seq("x"))
      .collect()(0)
    assert(got.getLong(1) == 0 && got.getLong(3) == 1) // count_a 0, nulls_a 1
    assert(got.getLong(11) == -1000000L)               // 0 - 1.0 rate
    assert(!got.getBoolean(12))                        // null == null: no change
  }
}
