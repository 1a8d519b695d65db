package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental dedup against a persisted signature directory: the delta
  * paths (sign ONLY new docs, join the stored directory) must reproduce a
  * from-scratch run of the union — the same discipline as
  * PipelineDeltaSpec for validation. Directories round-trip through
  * parquet in every test: the persistence IS the point.
  */
class DedupDeltaSpec extends SparkTestBase {

  // monotone ingest: prev ids 1..12, new ids 21..30 — the natural
  // snapshot shape under which first-seen-wins ≡ min-id-wins
  private def prevDocs = {
    val session = spark
    import session.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about astronomy telescopes and distant galaxies"),
      (3L, "THE QUICK  BROWN fox jumps over the lazy dog near the river bank today"), // canon-dup of 1
      (4L, "grain harvest reports from the northern valley arrive every september"),
      (5L, "unique prior document about maritime navigation and coastal lighthouses"),
      (12L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
    ).toDF("doc_id", "text")
  }

  private def newDocs = {
    val session = spark
    import session.implicits._
    Seq(
      (21L, "the quick brown fox jumps over the lazy dog near the river bank today"), // dup of PREV 1 → drop
      (22L, "fresh reporting on orbital telescope maintenance missions this year"),
      (23L, "Grain Harvest reports from the northern VALLEY arrive every september"),  // canon-dup of PREV 4 → drop
      (24L, "fresh reporting on orbital telescope maintenance missions this year "),   // canon-dup of NEW 22 → 22 kept
      (25L, "entirely new content with no duplicate anywhere in either snapshot"),
      (30L, "fresh REPORTING on orbital telescope maintenance missions this year")     // canon-dup of NEW 22 → drop
    ).toDF("doc_id", "text")
  }

  private def roundTrip(df: DataFrame, name: String): DataFrame = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-$name").toString
    df.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("fingerprint delta ≡ from-scratch dedup of the union (monotone ids), via a persisted directory") {
    val dir = roundTrip(Dedup.fingerprintDirectory(prevDocs), "fpdir")
    val (kept, dirDelta) = Dedup.fingerprintDedupDelta(newDocs, dir)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == Set(22L, 25L), keptIds.toString)

    // prev kept ∪ delta kept ≡ full recompute of the union
    val prevKept = Dedup.fingerprintDedup(prevDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fullKept = Dedup.fingerprintDedup(prevDocs.unionByName(newDocs))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(prevKept ++ keptIds == fullKept, s"${prevKept ++ keptIds} != $fullKept")

    // the updated directory ≡ a from-scratch directory of the union
    val updated = dir.unionByName(dirDelta)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // from-scratch keeps min-id per fp; first-seen keepers agree under
    // monotone ids by construction
    val scratch = Dedup.fingerprintDirectory(prevDocs.unionByName(newDocs))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(updated == scratch, s"$updated != $scratch")
  }

  test("a non-monotone duplicate still drops (first-seen-wins, streaming contract)") {
    val dir = Dedup.fingerprintDirectory(prevDocs)
    val session = spark
    import session.implicits._
    // id 0 < every prev id but duplicates prev content → dropped anyway
    val sneaky = Seq((0L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val (kept, _) = Dedup.fingerprintDedupDelta(sneaky, dir)
    assert(kept.count() == 0L)
  }

  test("minhash delta candidates: prev pairs ∪ delta pairs ≡ from-scratch candidates of the union") {
    val all = prevDocs.unionByName(newDocs)
    def pairSet(df: DataFrame) = df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val dir = roundTrip(Dedup.minhashDirectory(prevDocs), "mhdir")
    val (deltaCands, dirDelta) = Dedup.minhashCandidatesDelta(newDocs, dir)
    val prevPairs = pairSet(Dedup.minhashCandidates(prevDocs))
    val fullPairs = pairSet(Dedup.minhashCandidates(all))
    val deltaPairs = pairSet(deltaCands)
    assert(fullPairs.nonEmpty && deltaPairs.nonEmpty, "fixture mined no pairs")
    assert(deltaPairs.forall { case (a, b) => b >= 21L || a >= 21L },
      s"delta pair without a new doc: $deltaPairs")
    assert(prevPairs ++ deltaPairs == fullPairs,
      s"missing: ${fullPairs -- prevPairs -- deltaPairs}; extra: ${(prevPairs ++ deltaPairs) -- fullPairs}")

    // signatures carried on delta pairs agree with the full path's —
    // the agreement prefilter must behave identically
    val fullAgg = Dedup.minhashCandidates(all)
      .withColumn("agg", Dedup.sigAgreement(col("sig_a"), col("sig_b"), 32))
      .select("id_a", "id_b", "agg").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val deltaAgg = deltaCands
      .withColumn("agg", Dedup.sigAgreement(col("sig_a"), col("sig_b"), 32))
      .select("id_a", "id_b", "agg").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    deltaAgg.foreach { case (k, v) =>
      assert(fullAgg(k) == v, s"agreement drift on $k: $v vs ${fullAgg(k)}") }

    // compaction: directory ∪ delta with recomputed sizes ≡ from-scratch
    def dirSet(df: DataFrame) = df.collect().map(r => (
      r.getAs[Int]("band"), r.getAs[Long]("bucket"),
      r.getAs[Long]("id"), r.getAs[Long]("bucket_size"))).toSet
    val compacted = dirSet(Dedup.minhashDirectoryCompact(dir, dirDelta))
    val scratch = dirSet(Dedup.minhashDirectory(all))
    assert(compacted == scratch)
  }

  test("hot stored buckets are capped in the delta join like the full path") {
    val session = spark
    import session.implicits._
    // every prev doc identical → one hot bucket per band in the directory
    val hotPrev = (1L to 50L).map(i =>
      (i, "identical boilerplate text repeated across every single document here"))
      .toDF("doc_id", "text")
    val dir = Dedup.minhashDirectory(hotPrev)
    val one = Seq((99L, "identical boilerplate text repeated across every single document here"))
      .toDF("doc_id", "text")
    val (cands, _) = Dedup.minhashCandidatesDelta(one, dir, maxBucketSize = 10)
    assert(cands.count() == 0L, "hot stored bucket must be capped out")
    val (cands2, _) = Dedup.minhashCandidatesDelta(one, dir, maxBucketSize = 100)
    assert(cands2.count() == 50L)
  }

  test("two increments, append WITHOUT compact: no new x previous-increment pair is lost") {
    val session = spark
    import session.implicits._
    // increment 1 introduces a NEW text; increment 2 duplicates it — the
    // only path to that candidate pair is through the increment-1 rows
    // APPENDED to the directory with NULL bucket_size (the round-8 verdict
    // gap: a `bucket_size <= max` filter silently dropped them)
    val inc1 = Seq(
      (21L, "fresh reporting on orbital telescope maintenance missions this year"),
      (22L, "entirely new content with no duplicate anywhere in either snapshot")
    ).toDF("doc_id", "text")
    val inc2 = Seq(
      (31L, "fresh reporting on orbital telescope maintenance missions this year"), // dup of inc1's 21
      (32L, "the quick brown fox jumps over the lazy dog near the river bank today") // dup of prev 1/12
    ).toDF("doc_id", "text")
    def pairSet(df: DataFrame) = df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val dir0 = roundTrip(Dedup.minhashDirectory(prevDocs), "mhdir2")
    val (cands1, delta1) = Dedup.minhashCandidatesDelta(inc1, dir0)
    // append WITHOUT compacting: delta rows keep bucket_size = NULL
    val dir1 = roundTrip(dir0.unionByName(delta1), "mhdir2-app")
    assert(dir1.filter(col("bucket_size").isNull).count() > 0,
      "fixture must exercise un-compacted NULL-size rows")
    val (cands2, _) = Dedup.minhashCandidatesDelta(inc2, dir1)

    val full = pairSet(Dedup.minhashCandidates(
      prevDocs.unionByName(inc1).unionByName(inc2)))
    val mined = pairSet(Dedup.minhashCandidates(prevDocs)) ++
      pairSet(cands1) ++ pairSet(cands2)
    assert(full.contains((21L, 31L)), "fixture lost its cross-increment pair")
    assert(mined == full,
      s"missing: ${full -- mined}; extra: ${mined -- full}")
  }
}
