package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Cluster-balanced diversity sampling: assignment correctness (incl. the
  * lowest-index tie-break the oracle mirrors), the per-cluster cap, and
  * smallest-id winner selection.
  */
class DiversitySampleSpec extends SparkTestBase {

  private val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))

  private def emb(rows: (Long, Seq[Double])*) = {
    val session = spark
    import session.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("assignment: nearest centroid wins; equal dots break to the lowest index") {
    val df = emb(1L -> Seq(2.0, 0.0), 2L -> Seq(0.0, 3.0), 3L -> Seq(1.0, 1.0))
    val got = Similarity.diversitySample(df, cents, 10)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0)) // 3 ties 1.0 vs 1.0 → c0
  }

  test("per-cluster cap keeps the smallest ids, every cluster capped independently") {
    // c0 gets ids 1..5, c1 gets ids 11..13
    val df = emb((1L to 5L).map(i => i -> Seq(1.0, 0.0)) ++
      (11L to 13L).map(i => i -> Seq(0.0, 1.0)): _*)
    val kept = Similarity.diversitySample(df, cents, 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 11L, 12L))
  }

  test("NULL embeddings are dropped, not misassigned") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, Option(Seq(2.0, 0.0))), (2L, Option.empty[Seq[Double]]))
      .toDF("vec_id", "embedding")
    val kept = Similarity.diversitySample(df, cents, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("zero vector assigns to centroid 0 (all scores zero, first index)") {
    val got = Similarity.diversitySample(emb(7L -> Seq(0.0, 0.0)), cents, 1)
      .select("cluster").collect()(0).getInt(0)
    assert(got == 0)
  }
}
