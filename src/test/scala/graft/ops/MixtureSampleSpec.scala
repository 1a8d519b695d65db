package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Mixture-target token-budget sampler: hand-verified plan arithmetic,
  * structural parity with the md5 stratified contract, and achieved-mixture
  * tolerance on a corpus large enough for the law of large numbers.
  */
class MixtureSampleSpec extends SparkTestBase {

  // 10 whitespace tokens per doc, ids disjoint across sources
  private def corpus(counts: Map[String, Int]) = {
    val session = spark
    import session.implicits._
    counts.toSeq.sortBy(_._1).zipWithIndex.flatMap { case ((src, n), si) =>
      (0 until n).map(i => (si * 1000000L + i, src, s"w$i a b c d e f g h i"))
    }.toDF("doc_id", "source", "text")
  }

  test("plan arithmetic: floor targets, floor rates, deficit keeps all, unlisted drops") {
    val df = corpus(Map("A" -> 100, "B" -> 50, "C" -> 10, "D" -> 7))
    val plan = Sampling.mixturePlan(df, "source", "text",
        Map("A" -> 50L, "B" -> 30L, "C" -> 20L), 600L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // totals 1000/500/100/70; targets 600*{50,30,20}/100 = 300/180/120
    assert(plan("A") == ((1000L, 300L, 76L)))  // 300*256/1000 = 76.8 → 76
    assert(plan("B") == ((500L, 180L, 92L)))   // 180*256/500 = 92.16 → 92
    assert(plan("C") == ((100L, 120L, 256L)))  // deficit → keep everything
    assert(plan("D") == ((70L, 0L, 0L)))       // unlisted → rate 0
  }

  test("sample equals md5SampleStratified under the computed plan; C whole, D dropped") {
    val df = corpus(Map("A" -> 100, "B" -> 50, "C" -> 10, "D" -> 7))
    val got = Sampling.mixtureSample(df, "doc_id", "source", "text",
        Map("A" -> 50L, "B" -> 30L, "C" -> 20L), 600L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exp = Sampling.md5SampleStratified(df, "doc_id", "source",
        Map("A" -> 76, "B" -> 92, "C" -> 256), defaultBuckets256 = 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == exp)
    val bySrc = df.filter(col("doc_id").isin(got.toSeq: _*))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("C") == 10L, s"deficit source must keep all: $bySrc")
    assert(!bySrc.contains("D"), s"unlisted source must drop: $bySrc")
  }

  test("achieved mixture is within quantization + sampling error of the target") {
    val df = corpus(Map("A" -> 2000, "B" -> 2000, "C" -> 300))
    val parts = Map("A" -> 40L, "B" -> 40L, "C" -> 20L)
    val budget = 20000L
    val plan = Sampling.mixturePlan(df, "source", "text", parts, budget)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val kept = Sampling.mixtureSample(df, "doc_id", "source", "text", parts, budget)
      .groupBy("source").agg(sum(TextAnalysis.tokenCount(col("text"))).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    plan.foreach { case (src, (total, target)) =>
      if (total <= target) assert(kept(src) == total, s"$src deficit must keep all")
      else {
        val rate = target.toDouble / total
        val nDocs = total / 10.0
        // 1/256 rate quantization + 4σ of the md5 "coin flips", in tokens
        val tol = total / 256.0 + 4 * math.sqrt(nDocs * rate * (1 - rate)) * 10
        assert(math.abs(kept(src) - target) <= tol,
          s"$src kept ${kept(src)} vs target $target (tol $tol)")
      }
    }
  }

  test("temperatureParts: alpha endpoints and the flattening midpoint") {
    val totals = Map("A" -> 1000000L, "B" -> 10000L, "C" -> 100L)
    // alpha=1: natural proportions, largest pinned at scale
    assert(Sampling.temperatureParts(totals, 1.0) ==
      Map("A" -> 1000000L, "B" -> 10000L, "C" -> 100L))
    // alpha=0: uniform
    assert(Sampling.temperatureParts(totals, 0.0) ==
      Map("A" -> 1000000L, "B" -> 1000000L, "C" -> 1000000L))
    // alpha=0.5: sqrt flattening — each decade of size becomes a half-decade
    assert(Sampling.temperatureParts(totals, 0.5) ==
      Map("A" -> 1000000L, "B" -> 100000L, "C" -> 10000L))
    // zero/negative totals get zero parts; empty-positive map all zero
    assert(Sampling.temperatureParts(Map("A" -> 100L, "B" -> 0L), 0.5)("B") == 0L)
    assert(Sampling.temperatureParts(Map("A" -> 0L), 0.7) == Map("A" -> 0L))
  }

  test("temperatureParts feed mixturePlan: flattened mixture upweights the small source") {
    val df = corpus(Map("A" -> 200, "B" -> 20))
    val totals = Map("A" -> 2000L, "B" -> 200L)
    val natural = Sampling.mixturePlan(df, "source", "text",
        Sampling.temperatureParts(totals, 1.0), 1100L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val flat = Sampling.mixturePlan(df, "source", "text",
        Sampling.temperatureParts(totals, 0.5), 1100L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // natural: targets split 10:1; flattened: sqrt ratio ~3.16:1
    assert(natural("A") == 1000L && natural("B") == 100L)
    assert(flat("B") > natural("B") && flat("A") < natural("A"))
  }

  test("planted power-of-4 totals make every alpha part an exact power of two (oracle exactness guard)") {
    // the q_temperature_parts/q_temperature_mix plant: totals 4^(i+5),
    // scale 2^20 — guards the ONLY floating-point step of the oracle on
    // this JVM: pow must land each part exactly on 2^(20-k) so the
    // floor(x+0.5) rounding can never diverge from DuckDB's
    val n = 20
    val totals = (0 until n).map(i => s"s$i" -> (1L << (2 * (i + 5)))).toMap
    val ph = Sampling.temperatureParts(totals, 0.5, 1048576L)
    val p1 = Sampling.temperatureParts(totals, 1.0, 1048576L)
    val p0 = Sampling.temperatureParts(totals, 0.0, 1048576L)
    (0 until n).foreach { i =>
      val k = (n - 1) - i
      assert(ph(s"s$i") == (1L << 20) / (1L << k), s"a=0.5 i=$i: ${ph(s"s$i")}")
      val exact1 = math.round(math.pow(2.0, (20 - 2 * k).toDouble))
      assert(p1(s"s$i") == exact1, s"a=1 i=$i: ${p1(s"s$i")} vs $exact1")
      assert(p0(s"s$i") == 1048576L)
    }
    // the JVM-pow identities the plant relies on
    totals.values.foreach { t =>
      assert(math.pow(t.toDouble, 0.5) == math.sqrt(t.toDouble))
      assert(math.pow(t.toDouble, 1.0) == t.toDouble)
    }
  }
}
