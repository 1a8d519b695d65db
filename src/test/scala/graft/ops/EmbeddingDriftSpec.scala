package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Exact integer vector sums and the embedding-space drift monitor built
  * on them.
  */
class EmbeddingDriftSpec extends SparkTestBase {

  private def genCases[A](g: Gen[A], n: Int, seed: Long = 700L): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed + i)))

  test("longVecSum: elementwise-exact under any partitioning; nulls and short rows degrade") {
    val session = spark
    import session.implicits._
    val dim = 5
    val rows = genCases(Gen.listOfN(dim, Gen.chooseNum(-1000L, 1000L)), 400)
    val got = rows.map(r => Tuple1(r)).toDF("v").repartition(13)
      .agg(graft.functions.LongVecSumAgg.longVecSum(col("v"), dim))
      .collect()(0).getSeq[Long](0)
    val exp = (0 until dim).map(i => rows.map(_(i)).sum)
    assert(got == exp)
    // short row contributes its prefix; longer row truncates at dim
    val ragged = Seq(Tuple1(Seq(1L, 2L)), Tuple1(Seq(10L, 20L, 30L, 40L, 50L, 60L)))
      .toDF("v")
      .agg(graft.functions.LongVecSumAgg.longVecSum(col("v"), dim))
      .collect()(0).getSeq[Long](0)
    assert(ragged == Seq(11L, 22L, 30L, 40L, 50L))
  }

  test("intCentroid is the exact quantized sum; embeddingDrift flags a shifted snapshot and clears an identical one") {
    val session = spark
    import session.implicits._
    val dim = 8
    val base = genCases(Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0)), 300)
      .map(v => Tuple1(v.map(_.toFloat)))
    val a = base.toDF("embedding").repartition(7)
    // exact centroid equals the driver-side arithmetic
    val c = Similarity.intCentroid(a, "embedding", dim)
    val exp = (0 until dim).map(i =>
      base.map(r => math.round(r._1(i).toDouble * 1024)).sum)
    assert(c.toSeq == exp)

    // identical snapshots: every PSI term is ~0
    val same = Similarity.embeddingDrift(a, a, "embedding", dim)
      .agg(sum(abs(col("term")))).collect()(0).getDouble(0)
    assert(same < 1e-12, s"identical sides drifted: $same")

    // shifted snapshot (first coordinate pushed hard positive): cosine to
    // the baseline centroid redistributes across bins → PSI fires
    val b = base.map(v => Tuple1((v._1(0) + 5.0f) +: v._1.tail)).toDF("embedding")
    val drift = Similarity.embeddingDrift(a, b, "embedding", dim)
      .agg(sum(col("term"))).collect()(0).getDouble(0)
    assert(drift > 0.5, s"shifted snapshot under-reported: $drift")
  }
}
