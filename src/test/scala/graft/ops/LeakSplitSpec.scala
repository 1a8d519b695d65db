package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Leakage-safe split: group atomicity (the property that makes it
  * leakage-safe), parity with the md5Bucket keep-set contract, achieved
  * fraction over many groups, and the degenerate bounds.
  */
class LeakSplitSpec extends SparkTestBase {

  // 512 groups x 4 member docs; members share the group key only
  private def corpus() = {
    val session = spark
    import session.implicits._
    (0 until 512).flatMap { g =>
      (0 until 4).map(i => (g * 10L + i, s"domain$g.example"))
    }.toDF("doc_id", "grp")
  }

  test("every group lands whole on one side") {
    val sides = Sampling.leakSafeSplit(corpus(), "grp", 64)
      .groupBy("grp").agg(countDistinct("split").as("n"))
      .agg(max("n")).collect()(0).getLong(0)
    assert(sides == 1L)
  }

  test("heldout rows are exactly the md5Sample keep-set on the group key") {
    val df = corpus()
    val held = Sampling.leakSafeSplit(df, "grp", 64)
      .filter(col("split") === "heldout")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exp = Sampling.md5Sample(df, "grp", 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(held == exp)
  }

  test("achieved heldout GROUP fraction tracks heldout256/256") {
    val frac = Sampling.leakSafeSplit(corpus(), "grp", 64)
      .filter(col("split") === "heldout")
      .select("grp").distinct().count() / 512.0
    assert(frac > 0.18 && frac < 0.32, s"heldout group fraction $frac")
  }

  test("NULL group keys land in train — never contaminate heldout") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, Option("g1")), (2L, Option.empty[String]))
      .toDF("doc_id", "grp")
    val nullSide = Sampling.leakSafeSplit(df, "grp", 255)
      .filter(col("doc_id") === 2L).select("split").collect()(0).getString(0)
    assert(nullSide == "train")
  }

  test("degenerate bounds: 0 is all train, 256 all heldout") {
    val df = corpus()
    assert(Sampling.leakSafeSplit(df, "grp", 0)
      .filter(col("split") === "heldout").count() == 0L)
    assert(Sampling.leakSafeSplit(df, "grp", 256)
      .filter(col("split") === "train").count() == 0L)
  }
}
