package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the round-5 curation invariants, generator style per
  * ValidatorPropertySpec (scalacheck Gen driven directly; Spark evaluation
  * batched into one job per property).
  */
class CurationPropertySpec extends SparkTestBase {

  private def genCases[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(90L + i)))

  test("canonicalizeUrl: idempotent over generated well-formed URLs of every shape") {
    val session = spark
    import session.implicits._
    val label = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))
    val urls = genCases(for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "hTtPs")
      host <- Gen.listOfN(3, label).map(_.mkString("."))
      up <- Gen.oneOf(identity[String] _, (s: String) => s.toUpperCase)
      port <- Gen.oneOf("", ":80", ":443", ":8080", ":9")
      path <- Gen.oneOf("", "/", "/A/b", "/p?Q=x&y=2")
      frag <- Gen.oneOf("", "#f", "#Frag/2?x")
    } yield s"$scheme://${up(host)}$port$path$frag", 300)
    val got = urls.toDF("u")
      .select(col("u"), UrlOps.canonicalizeUrl(col("u")).as("c1"))
      .withColumn("c2", UrlOps.canonicalizeUrl(col("c1")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    got.foreach { case (u, c1, c2) =>
      assert(c1 == c2, s"not idempotent for [$u]: [$c1] -> [$c2]")
      assert(!c1.contains("#"), s"fragment survived for [$u]: [$c1]")
    }
  }

  test("packIntoShards: every doc assigned once; shards nondecreasing from 0 in id order per bucket") {
    val session = spark
    import session.implicits._
    val sizes = genCases(Gen.chooseNum(0, 30), 400)
    val docs = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong, ("w " * n).trim) }.toDF("doc_id", "text")
    val out = Sampling.packIntoShards(docs, tokensPerShard = 25L, nBuckets = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == sizes.length, "every doc assigned exactly once")
    out.groupBy(_._2).foreach { case (b, rows) =>
      val inOrder = rows.sortBy(_._1)
      val shards = inOrder.map(_._4)
      assert(shards.head == 0L, s"bucket $b must start at shard 0")
      assert(shards.zip(shards.tail).forall { case (a, c) => a <= c },
        s"bucket $b shards not monotone: ${shards.toSeq}")
      // recompute the start-offset fold independently
      var cum = 0L
      inOrder.foreach { case (_, _, n, shard) =>
        assert(shard == cum / 25L, s"bucket $b: shard $shard != ${cum / 25L}")
        cum += n
      }
    }
  }
}
