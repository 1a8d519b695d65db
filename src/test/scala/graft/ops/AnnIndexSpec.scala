package graft.ops

import graft.SparkTestBase

/** The partitioned RHP-LSH index: probes must be partition-pruned reads of
  * the (band, bucket) layout, not full scans of the signed table (the
  * round-2 verdict's remaining ANN scale-killer).
  */
class AnnIndexSpec extends SparkTestBase {

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
}
