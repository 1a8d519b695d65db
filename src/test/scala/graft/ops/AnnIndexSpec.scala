package graft.ops

import graft.SparkTestBase

/** The partitioned RHP-LSH index: probes must be partition-pruned reads of
  * the (band, bucket) layout, not full scans of the signed table (the
  * round-2 verdict's remaining ANN scale-killer).
  */
class AnnIndexSpec extends SparkTestBase {

  test("matryoshka: first-d slice renormalized to unit length, zero-vector safe, reference parity") {
    val session = spark
    import session.implicits._
    val vecs = Seq(
      (1L, Seq(3.0f, 4.0f, 100.0f, -7.0f, 9.0f)),
      (2L, Seq(-1.0f, 2.0f, -3.0f, 4.0f, 5.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f, 0.0f))) // zero vector → all zeros
      .toDF("vec_id", "embedding")
    val got = vecs.select($"vec_id",
        Similarity.matryoshka($"embedding", 2).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def ref(xs: Seq[Float], d: Int): Seq[Double] = {
      val s = xs.take(d).map(_.toDouble)
      val n = math.sqrt(s.map(x => x * x).sum)
      if (n == 0.0) s.map(_ => 0.0) else s.map(_ / n)
    }
    assert(got(1L).zip(ref(Seq(3.0f, 4.0f), 2)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(math.abs(got(1L)(0) - 0.6) < 1e-9 && math.abs(got(1L)(1) - 0.8) < 1e-9)
    assert(got(2L).zip(ref(Seq(-1.0f, 2.0f), 2)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(got(3L) == Seq(0.0, 0.0))
    // unit norm for non-zero inputs
    assert(math.abs(got(1L).map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("RHP index: probe partition-prunes to the query's band buckets, exact rescore") {
    val session = spark
    import session.implicits._
    val vecs = (0 until 400).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Seq.tabulate(8)(d =>
        base * (1.0f + d * 0.1f) + (math.sin(i * 0.37 + d) * 0.05).toFloat))
    }.toDF("vec_id", "embedding")

    val idx = java.nio.file.Files.createTempDirectory("graft-ann").toString + "/index"
    Similarity.buildAnnIndex(vecs, idx)

    val query = vecs.filter($"vec_id" === 123).collect()(0).getSeq[Float](1)
    val probed = Similarity.annTopKIndexed(spark, idx, query, k = 3)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("band"),
      s"no partition pruning in plan:\n$plan")

    val top = probed.collect()
    assert(top(0).getLong(0) == 123L)
    assert(math.abs(top(0).getDouble(1) - 1.0) < 1e-6)

    // agreement with the in-memory signed-table probe (same buckets, same
    // rescore) — the index changes the layout, not the result
    val mem = Similarity.annTopK(vecs, query, k = 3).collect().map(_.getLong(0)).toSeq
    assert(top.map(_.getLong(0)).toSeq == mem)
  }

  test("SemDeDup: cluster-scoped near-dup pairs find exactly the planted twins") {
    val session = spark
    import session.implicits._
    // two well-separated clusters with hash-noise spread (a sinusoid here
    // is a trap: sin(0.37·i) has period ≈17, producing unplanted
    // near-identical vector pairs); base-base cosines stay ≤ ~0.99, the
    // planted twin (one coordinate nudged) sits at ≈ 1 - 3e-8
    def noise(i: Int, d: Int): Float = {
      // splitmix64 of (i, d): a LINEAR blend of i and d is also a trap —
      // noise differences become constant across dims (parallel shift)
      var z = i * 8L + d + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (((z ^ (z >>> 31)) % 1000L + 1000L) % 1000L) / 1000.0f * 0.6f - 0.3f
    }
    val base = (0 until 300).map { i =>
      val b = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Seq.tabulate(8)(d => b * (1.0f + d * 0.1f) + noise(i, d)))
    }
    val twins = base.filter(_._1 % 10 == 0).map { case (i, v) =>
      (i + 10000L, v.updated(0, v.head + 0.001f))
    }
    val vecs = (base ++ twins).toDF("vec_id", "embedding")
    val model = Ivf.train(vecs, c = 4, iters = 2)

    // 0.99999: the nudged twins sit at ≈ 1-3e-8; a chance base-base pair
    // this close would need all 8 noise dims to agree within ~6e-3
    val pairs = Similarity.semanticDupPairs(vecs, model, threshold = 0.99999)
      .collect()
    val got = pairs.map(r => (r.getLong(1), r.getLong(2))).toSet
    val expected = twins.map(t => (t._1 - 10000L, t._1)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // every pair is intra-cluster by construction: the pair's cluster is
    // the assignment of both members
    val assigned = Ivf.assign(vecs, model).select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs.foreach { r =>
      assert(assigned(r.getLong(1)) == r.getInt(0) && assigned(r.getLong(2)) == r.getInt(0))
    }
  }
}
