package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.datagen.DocGen
import graft.engine.Pipeline
import graft.ops.{Dedup, Similarity, TextAnalysis}
import graft.stats.ColumnStats

/** The headline benchmark stage in its own PINNED JVM (spawned by
  * [[Bench]], exactly like the scaling probes): round 4's recording ran the
  * headline queries inside the launcher's JVM, which under sbt inherits an
  * ~80 GiB heap whose GC ate 42% of the stage (`gc_headline_ms: 25212` of a
  * ~60 s two-trial stage → 28.5 s recorded vs 8.1 s in a pinned JVM). The
  * scaling probes were already pinned for exactly this reason; this main
  * closes the same variable for the headline numbers.
  *
  * Args: `<cpus> <sfDir> <nDocs> <docsPath> <scalePath> <scaleDocs>
  * <sliceDocs>`. Protocol on stdout (parent flushes its JSON snapshot after
  * every line, so a kill at any point keeps all completed stages):
  *  - `RESULT <name> <sec>`  — one timed stage (−1.0 marks a failed stage)
  *  - `DIAG <json>`          — this JVM's environment facts + headline GC
  *  - `SCALE_CORPUS_READY`   — the sliced probe corpus is fully written
  * Diagnostics go to stderr (inherited).
  */
object HeadlineMain {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  private def emit(line: String): Unit = { println(line); System.out.flush() }

  def main(args: Array[String]): Unit = {
    val Array(cpusStr, sfDir, nDocsStr, docsPath, scalePath, scaleDocsStr,
      sliceDocsStr) = args
    val cpus = cpusStr.toInt
    val nDocs = nDocsStr.toLong
    val scaleDocs = scaleDocsStr.toLong
    val sliceDocs = sliceDocsStr.toLong

    val spark = BenchUtil.session(cpus)

    // ---- materialize the headline corpus (128-way layout) ---------------
    DocGen.documents(spark, nDocs).toDF()
      .repartition(128).write.mode("overwrite").parquet(docsPath)

    def tbl(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    def bench(name: String)(f: => Any): Unit = {
      val t = try time(f) catch { case e: Throwable =>
        System.err.println(s"[headline] $name failed: ${e.getMessage}"); -1.0 }
      emit(f"RESULT $name $t%.3f")
    }

    // JIT warm-up: one validation pass over a slice compiles the validator
    // regex + codegen paths so headline timings measure steady state
    Pipeline.violations(spark,
      spark.read.parquet(docsPath).limit(50000), DocGen.schema).count()

    // two timed passes: first ≈ what a cold run sees, min ≈ steady state —
    // both ship; `_first`/`_cached` are informational and excluded from the
    // headline total. The STEADY trial doubles as the verdicts-stage input:
    // cache().count() materializes the violations while being timed — same
    // measurement semantics (one full validation pass over cold input), no
    // third untimed pass.
    var gcHeadline = 0L
    var cachedViols: Option[DataFrame] = None
    try {
      val gc0 = gcMillis
      val vf1 = time(Pipeline.violations(spark,
        spark.read.parquet(docsPath), DocGen.schema).count())
      // record the first pass immediately: a failure of the SECOND pass
      // must not discard a valid measurement
      emit(f"RESULT validate_full $vf1%.3f")
      emit(f"RESULT validate_full_first $vf1%.3f")
      val cached = Pipeline.violations(spark,
        spark.read.parquet(docsPath), DocGen.schema).cache()
      // vf2 includes the cache build — usually still the faster trial
      // (JIT-warm); min() keeps vf1 as the headline whenever the cache cost
      // dominates. gcHeadline spans both trials incl. the cache build.
      val vf2 = time(cached.count())
      cachedViols = Some(cached)
      emit(f"RESULT validate_full ${math.min(vf1, vf2)}%.3f")
      emit(f"RESULT validate_full_cached $vf2%.3f")
      gcHeadline = gcMillis - gc0
    } catch { case e: Throwable =>
      System.err.println(s"[headline] validate_full failed: ${e.getMessage}")
      emit("RESULT validate_full -1.0")
    }
    emit(s"DIAG ${BenchUtil.diagJson(gcHeadline)}")
    // verdicts roll up the violations frame the steady trial materialized
    // (the ValidatorApp flow: no second validation pass). If the cached
    // trial failed, rebuild the cache untimed.
    if (cachedViols.isEmpty) {
      try {
        val c = Pipeline.violations(spark,
          spark.read.parquet(docsPath), DocGen.schema).cache()
        c.count()
        cachedViols = Some(c)
      } catch { case e: Throwable =>
        System.err.println(s"[headline] verdicts cache rebuild failed: ${e.getMessage}")
      }
    }
    bench("verdicts") {
      val viols = cachedViols.getOrElse(
        sys.error("no violations frame (validation failed twice)"))
      // sum(nViolations) forces the violation aggregation — a bare count()
      // lets Catalyst eliminate the unique-key left join entirely
      Pipeline.verdictsFrom(spark, viols, spark.read.parquet(docsPath),
        DocGen.schema, "bench", 64).agg(sum("nViolations")).collect()
    }
    cachedViols.foreach(_.unpersist())
    bench("stats_profile") { ColumnStats.profile(tbl("lineitem")).count() }
    bench("stats_mergeable") { // round-8: per-source mergeable profile
      // (exact channels + HLL + KLL blobs) folded to the corpus profile
      ColumnStats.mergeProfiles(ColumnStats.mergeableProfile(
        tbl("documents"), "source", Seq("doc_id", "n_chars", "lang")))
        .agg(sum("n")).collect()
    }
    bench("dedup_exact") { Dedup.exactGroups(tbl("documents")).count() }
    bench("dedup_minhash") { Dedup.nearDupPairs(tbl("documents")).count() }
    bench("dedup_simhash") { Dedup.simhashPairs(tbl("documents")).count() }
    bench("passage_dedup") { // round-7 flagship: exact shared-span surgery
      Dedup.passageDedup(tbl("documents")).agg(sum(col("cut_tokens"))).collect()
    }
    bench("langid_quality") {
      tbl("documents").select(
        TextAnalysis.langId(col("text")).as("lid"),
        TextAnalysis.qualityScore(col("text")).as("q"))
        .agg(count(lit(1)), avg(col("q"))).collect()
    }
    bench("curate") { // the composed hygiene→filter→dedup front door
      graft.ops.Curation.curate(tbl("documents")).count()
    }
    bench("ann_topk") {
      val emb = tbl("embeddings")
      val q = emb.orderBy("vec_id").limit(1).collect()(0).getSeq[Float](1)
      Similarity.bruteTopK(emb, q, 10).collect()
    }

    // ---- scale corpus -----------------------------------------------------
    // written ONCE at the ceiling size, sliced into `slice=<i>` subdirs of
    // sliceDocs each (doc ids are dense, so slice = id / sliceDocs): a
    // budget-pressured round probes a PREFIX of slices — per-round corpus
    // sizing with no regeneration and no limit() (which would collapse the
    // scan to one partition). One write per slice, 13 full-size files each:
    // a single partitionBy write was measured to fan out into ~2600 sub-MB
    // files whose per-file overhead depressed BOTH probe sides 20-30%.
    val nSlicesTotal = ((scaleDocs + sliceDocs - 1) / sliceDocs).toInt
    (0 until nSlicesTotal).foreach { i =>
      DocGen.documentsRange(spark, i * sliceDocs,
          math.min((i + 1) * sliceDocs, scaleDocs), scaleDocs).toDF()
        .repartition(13)
        .write.mode("overwrite").parquet(s"$scalePath/slice=$i")
    }
    emit("SCALE_CORPUS_READY")
    spark.stop()
  }
}
