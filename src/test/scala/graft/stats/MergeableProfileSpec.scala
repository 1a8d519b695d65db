package graft.stats

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Mergeable per-part column profiles: parts merge into the corpus profile
  * WITHOUT rescanning rows — counts/min/max/integral-sums EXACT under
  * merge, HLL distinct estimate bounded, merged profiles re-merge
  * (associativity). The stats twin of KllMergeSpec's contract.
  */
class MergeableProfileSpec extends SparkTestBase {

  // 5 "days" × 60k rows; integral k (with planted nulls), fractional f,
  // string s (nulls on a different stripe) — every typed channel exercised
  private def corpus = spark.range(300000).select(
    (col("id") % 5).as("day"),
    when(col("id") % 7 === 0, lit(null)).otherwise(col("id") % 1000).as("k"),
    (col("id") % 97).cast("double").as("f"),
    when(col("id") % 11 === 0, lit(null))
      .otherwise(concat(lit("s"), lpad((col("id") % 500).cast("string"), 4, "0")))
      .as("s"))

  private val cols = Seq("k", "f", "s")

  test("merged per-day profiles equal the direct corpus profile on every exact field") {
    val df = corpus.repartition(8)
    val parts = ColumnStats.mergeableProfile(df, "day", cols)
    assert(parts.count() == 5 * cols.size)
    val merged = ColumnStats.mergeProfiles(parts)
    val whole = ColumnStats.mergeProfiles(
      ColumnStats.mergeableProfile(df.withColumn("one", lit(1)), "one", cols))
    val exact = Seq("n", "nulls", "min_d", "max_d", "min_s", "max_s", "sum_l")
    val m = merged.select("column", exact: _*).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    val w = whole.select("column", exact: _*).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(m == w)
    // and against independently computed truth
    val mk = merged.filter(col("column") === "k").collect()(0)
    assert(mk.getAs[Long]("n") == 300000L - 300000L / 7 - 1) // ids ≡ 0 mod 7
    assert(mk.getAs[Long]("nulls") == 300000L / 7 + 1)
    assert(mk.getAs[Double]("min_d") == 0.0 && mk.getAs[Double]("max_d") == 999.0)
    assert(mk.isNullAt(mk.fieldIndex("min_s")) && mk.isNullAt(mk.fieldIndex("sum_d")))
    assert(mk.getAs[Long]("sum_l") > 0L)
    val ms = merged.filter(col("column") === "s").collect()(0)
    assert(ms.getAs[String]("min_s") == "s0000" && ms.getAs[String]("max_s") == "s0499")
    assert(ms.isNullAt(ms.fieldIndex("min_d")) && ms.isNullAt(ms.fieldIndex("sum_l")))
  }

  test("distinct_est tracks the exact distinct count within HLL error") {
    val merged = ColumnStats.mergeProfiles(
      ColumnStats.mergeableProfile(corpus, "day", cols))
    val est = merged.select("column", "distinct_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("k" -> 1000L, "f" -> 97L, "s" -> 500L)
    truth.foreach { case (c, t) =>
      assert(math.abs(est(c) - t) <= math.max(2L, (t * 0.05).toLong),
        s"$c: est ${est(c)} vs exact $t")
    }
  }

  test("merged profiles RE-merge: two-level merge equals one-level on exact fields and the HLL estimate") {
    val parts = ColumnStats.mergeableProfile(corpus, "day", cols).cache()
    val oneLevel = ColumnStats.mergeProfiles(parts)
    val lo = ColumnStats.mergeProfiles(parts.filter(col("part") < 3))
    val hi = ColumnStats.mergeProfiles(parts.filter(col("part") >= 3))
    val twoLevel = ColumnStats.mergeProfiles(
      lo.drop("distinct_est").unionByName(hi.drop("distinct_est")))
    val exact = Seq("n", "nulls", "min_d", "max_d", "min_s", "max_s", "sum_l")
    val a = oneLevel.select("column", exact: _*).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    val b = twoLevel.select("column", exact: _*).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(a == b)
    // the ESTIMATE plane is not bit-stable across merge shapes (the
    // DataSketches union gadget's mode transitions shift it a hair) —
    // both levels must still land within HLL error of the exact counts
    val truth = Map("k" -> 1000L, "f" -> 97L, "s" -> 500L)
    Seq(oneLevel, twoLevel).foreach { lvl =>
      val est = lvl.select("column", "distinct_est").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (c, t) =>
        assert(math.abs(est(c) - t) <= math.max(2L, (t * 0.05).toLong),
          s"$c: est ${est(c)} vs exact $t")
      }
    }
    parts.unpersist()
  }

  test("per-part stored-profile drift flags only the poisoned part; one-sided parts surface as added/removed") {
    // prev: 4 sources, v uniform per source; cur: source s2's v shifted
    // +500, source s3 gone, source s4 new
    def corpus(shift2: Boolean, drop3: Boolean, add4: Boolean) = {
      val base = spark.range(200000).select(
        concat(lit("s"), (col("id") % (if (drop3) 3 else 4)).cast("string")).as("src"),
        (col("id") % 1000).cast("double").as("v"))
      val shifted = if (shift2)
        base.withColumn("v", when(col("src") === "s2", col("v") + 500.0).otherwise(col("v")))
      else base
      if (add4) shifted.unionByName(spark.range(5000)
        .select(lit("s4").as("src"), (col("id") % 1000).cast("double").as("v")))
      else shifted
    }
    val prev = ColumnStats.mergeableProfile(corpus(false, false, false), "src", Seq("v"))
    val cur = ColumnStats.mergeableProfile(corpus(true, true, true), "src", Seq("v"))
    val drift = ProfileDrift.byPart(prev, cur).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(drift("s3").getString(2) == "removed" && drift("s4").getString(2) == "added")
    assert(drift("s2").getAs[Long]("ks_e6") > 200000L, drift("s2").toString)
    // theta value-set churn per part (exact-mode integers): prev sources
    // ride id%4 so their v sets are the 250 residues ≡ source mod 4; cur
    // rides id%3 (coprime with 1000) so every cur set is full. s2 moved
    // to 500..1499: of its 250 prev values the 125 below 500 disappeared,
    // 125 remain common, and 875 of cur's 1000 are new
    assert(drift("s2").getAs[Long]("values_only_prev") == 125L &&
      drift("s2").getAs[Long]("values_only_cur") == 875L &&
      drift("s2").getAs[Long]("values_common") == 125L, drift("s2").toString)
    assert(drift("s0").getAs[Long]("values_only_prev") == 0L &&
      drift("s0").getAs[Long]("values_common") == 250L)
    assert(drift("s3").getAs[Long]("values_only_prev") == 250L &&
      drift("s4").getAs[Long]("values_only_cur") == 1000L)
    Seq("s0", "s1").foreach { s =>
      assert(drift(s).getString(2) == "present")
      assert(drift(s).getAs[Long]("ks_e6") < 30000L, drift(s).toString)
    }
    // exact channels carried: counts per side
    assert(drift("s0").getAs[Long]("n_prev") == 50000L)
    assert(drift("s4").getAs[Long]("n_prev") == 0L &&
      drift("s4").getAs[Long]("n_cur") == 5000L)
  }

  test("per-part value-count drift from stored freq blobs: exact deltas, surges localized") {
    def corpus(shift: Boolean) = spark.range(60000).select(
      concat(lit("s"), (col("id") % 3).cast("string")).as("src"),
      when(lit(shift) && col("id") % 3 === 2 && col("id") % 4 =!= 0, lit("en"))
        .otherwise(concat(lit("L"), (col("id") % 4).cast("string"))).as("lang"))
    val prev = ColumnStats.mergeableProfile(corpus(false), "src", Seq("lang"))
    val cur = ColumnStats.mergeableProfile(corpus(true), "src", Seq("lang"))
    val d = ProfileDrift.valueCountsByPart(prev, cur).collect()
      .map(r => (r.getString(0), r.getString(2)) -> r).toMap
    // all sketches exact (≤5 values per part)
    assert(d.values.forall(_.getBoolean(6)))
    // source s2: "en" flooded in (15000 of its 20000 rows), the L1/L2/L3
    // counts it displaced drained to zero; s0/s1 untouched
    assert(d(("s2", "en")).getLong(4) == 15000L && d(("s2", "en")).getLong(3) == 0L)
    assert(d(("s2", "L1")).getLong(5) == -d(("s2", "L1")).getLong(3))
    Seq("s0", "s1").foreach { s2 =>
      (0 until 4).foreach { l =>
        assert(d((s2, s"L$l")).getLong(5) == 0L, d((s2, s"L$l")).toString)
      }
    }
  }

  test("fractional sums ride the double channel; integral the long channel") {
    val merged = ColumnStats.mergeProfiles(
      ColumnStats.mergeableProfile(corpus, "day", Seq("k", "f")))
    val mk = merged.filter(col("column") === "k").collect()(0)
    val mf = merged.filter(col("column") === "f").collect()(0)
    assert(mk.isNullAt(mk.fieldIndex("sum_d")) && !mk.isNullAt(mk.fieldIndex("sum_l")))
    assert(mf.isNullAt(mf.fieldIndex("sum_l")) && !mf.isNullAt(mf.fieldIndex("sum_d")))
    // 300000 rows of id%97: mean = sum_d / n recoverable at merge level
    val mean = mf.getAs[Double]("sum_d") / mf.getAs[Long]("n")
    assert(math.abs(mean - 47.99) < 0.2, s"mean $mean")
  }
}
