package graft.stats

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class StatsSpec extends SparkTestBase {

  test("kll_sketch: distributed sketch quantiles match exact quantiles") {
    val df = spark.range(100000).select((col("id") % 1000).cast("double").as("v"))
      .repartition(8)
    val bytes = df.agg(KllSketchAgg.kll_sketch(col("v"))).collect()(0).getAs[Array[Byte]](0)
    val s = DriftStats.sketchOf(bytes)
    assert(s.getN == 100000)
    assert(math.abs(s.getQuantile(0.5) - 500.0) < 25) // k=200 → ~1.6% rank error
    assert(s.getMinItem == 0.0 && s.getMaxItem == 999.0)
  }

  test("single-pass profile: count/nulls/distinct/min/max per column") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, "a", 1.5), (2L, "b", 2.5), (3L, null, 3.5), (4L, "a", 4.5)
    ).toDF("id", "s", "x")
    val p = ColumnStats.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 4 && p("id").getLong(2) == 0)
    assert(p("s").getLong(1) == 3 && p("s").getLong(2) == 1)
    assert(p("s").getLong(3) == 2) // approx distinct of {a,b} is exact here
    assert(p("x").getString(4) == "1.5" && p("x").getString(5) == "4.5")
    assert(p("x").getAs[Array[Byte]](6) != null) // numeric → sketch present
    assert(p("s").getAs[Array[Byte]](6) == null) // string → no sketch
  }

  test("drift: exact KS matches hand-computed sup on a tiny case and agrees with the sketch path") {
    val a = spark.range(50000).select((col("id") % 100).cast("double").as("v"))
    val b = spark.range(50000).select((col("id") % 100 + 50).cast("double").as("v"))
    // hand case: a={1,2,3,4}, b={3,4,5,6} → sup|F_a-F_b| at x=2: |2/4 - 0| = 0.5
    val ta = spark.range(4).select((col("id") + 1).cast("double").as("v"))
    val tb = spark.range(4).select((col("id") + 3).cast("double").as("v"))
    val tiny = DriftStats.ksExact(ta, tb, "v").collect()(0)
    assert(math.abs(tiny.getDouble(0) - 0.5) < 1e-12)
    assert(tiny.getLong(1) == 4 && tiny.getLong(2) == 4)
    val exact = DriftStats.ksExact(a, b, "v").collect()(0).getDouble(0)
    assert(math.abs(exact - 0.5) < 1e-12) // 50% shifted mass exactly
    def sk(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(KllSketchAgg.kll_sketch(col("v"))).collect()(0).getAs[Array[Byte]](0)
    // the KLL estimate must sit within its rank-error band of the exact stat
    assert(math.abs(DriftStats.ksStatistic(sk(a), sk(b)) - exact) < 0.05)
  }

  test("drift: exact PSI per-bin terms sum to the sketch PSI within tolerance; zero on identical input") {
    val a = spark.range(50000).select((col("id") % 100).cast("double").as("v"))
    val b = spark.range(50000).select((col("id") % 100 + 50).cast("double").as("v"))
    val terms = DriftStats.psiExact(a, b, "v").collect()
    assert(terms.length == 10)
    val exact = terms.map(_.getDouble(3)).sum
    def sk(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(KllSketchAgg.kll_sketch(col("v"))).collect()(0).getAs[Array[Byte]](0)
    assert(exact > 0.5) // real drift
    assert(math.abs(DriftStats.psi(sk(a), sk(b)) - exact) < 0.15 * exact)
    val same = DriftStats.psiExact(a, a, "v").collect().map(_.getDouble(3)).sum
    assert(math.abs(same) < 1e-12)
  }

  test("drift: psiExactByGroup == per-group psiExact; one-sided groups flag max drift, never crash") {
    val session = spark
    import session.implicits._
    val a = ((0 until 2000).map(i => ("g1", (i % 100).toDouble)) ++
      (0 until 1500).map(i => ("g2", (i % 40).toDouble)) ++
      (0 until 300).map(i => ("gone", (i % 10).toDouble))) // absent from b
      .toDF("src", "v")
    val b = ((0 until 2000).map(i => ("g1", (i % 100 + 50).toDouble)) ++ // drifted
      (0 until 1500).map(i => ("g2", (i % 40).toDouble)) ++              // same dist
      (0 until 200).map(i => ("new", (i % 10).toDouble)))                // absent from a
      .toDF("src", "v")
    val grouped = DriftStats.psiExactByGroup(a, b, "v", "src").collect()
      .groupBy(_.getString(0))
    // per-group rows equal the ungrouped op run on that group's slices
    for (g <- Seq("g1", "g2")) {
      val exp = DriftStats.psiExact(
          a.filter($"src" === g), b.filter($"src" === g), "v").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val got = grouped(g)
        .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      assert(got == exp, s"group $g: $got != $exp")
    }
    // drifted group's PSI large, stable group's ~0
    def psiOf(g: String) = grouped(g).map(_.getDouble(4)).sum
    assert(psiOf("g1") > 0.5, s"g1=${psiOf("g1")}")
    assert(math.abs(psiOf("g2")) < 1e-12, s"g2=${psiOf("g2")}")
    // one-sided groups: absent side floors at eps per bin → large positive
    // PSI (the new/vanished-category convention), and no ANSI 0/0 crash
    assert(psiOf("gone") > 1.0 && psiOf("new") > 1.0,
      s"gone=${psiOf("gone")} new=${psiOf("new")}")
  }

  test("profileByGroup: exact per-group stats over nulls; melt reads the materialized agg, not the corpus") {
    val session = spark
    import session.implicits._
    val df = Seq(
      ("s1", Some(5L), "en"), ("s1", None, "fr"), ("s1", Some(9L), "en"),
      ("s2", Some(2L), null.asInstanceOf[String]))
      .toDF("src", "n", "lang")
    val out = ColumnStats.profileByGroup(df, "src", Seq("n", "lang"))
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(5), r.getString(6)))).toMap
    assert(got(("s1", "n")) == ((2L, 1L, "5", "9")))
    assert(got(("s1", "lang")) == ((3L, 0L, "en", "fr")))
    assert(got(("s2", "n")) == ((1L, 0L, "2", "2")))
    assert(got(("s2", "lang")) == ((0L, 1L, null, null))) // count() skips nulls
    // the melt union must NOT re-run the corpus aggregation per column:
    // the plan's leaves are the checkpointed RDD, not repeated scans/aggs
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"melt re-aggregates:\n$plan")
  }

  test("drift: ksExactByGroup == per-group ksExact; one-sided groups read ks = 1") {
    val session = spark
    import session.implicits._
    val a = ((0 until 2000).map(i => ("g1", (i % 100).toDouble)) ++
      (0 until 1500).map(i => ("g2", (i % 40).toDouble)) ++
      (0 until 300).map(i => ("gone", (i % 10).toDouble))).toDF("src", "v")
    val b = ((0 until 2000).map(i => ("g1", (i % 100 + 50).toDouble)) ++
      (0 until 1500).map(i => ("g2", (i % 40).toDouble)) ++
      (0 until 200).map(i => ("new", (i % 10).toDouble))).toDF("src", "v")
    val got = DriftStats.ksExactByGroup(a, b, "v", "src").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    for (g <- Seq("g1", "g2")) {
      val exp = DriftStats.ksExact(
        a.filter($"src" === g), b.filter($"src" === g), "v").collect()(0)
      assert(got(g)._1 == exp.getDouble(0), s"group $g ks")
      assert(got(g)._2 == exp.getLong(1) && got(g)._3 == exp.getLong(2))
    }
    assert(got("g1")._1 > 0.4 && got("g2")._1 == 0.0)
    assert(got("gone")._1 == 1.0 && got("new")._1 == 1.0,
      s"one-sided groups must read maximal drift: $got")
  }

  test("drift: KS and PSI detect a distribution shift, stay ~0 on same dist") {
    val a = spark.range(50000).select((col("id") % 100).cast("double").as("v"))
    val b = spark.range(50000).select((col("id") % 100 + 50).cast("double").as("v"))
    def sk(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(KllSketchAgg.kll_sketch(col("v"))).collect()(0).getAs[Array[Byte]](0)
    val sa = sk(a); val sb = sk(b); val sa2 = sk(a)
    assert(DriftStats.ksStatistic(sa, sa2) < 0.02)
    assert(DriftStats.ksStatistic(sa, sb) > 0.4) // 50% shifted mass
    assert(DriftStats.psi(sa, sa2) < 0.01)
    assert(DriftStats.psi(sa, sb) > 0.5)
  }
}
