package graft

import org.apache.spark.sql.SparkSession
import graft.datagen.DocGen
import graft.engine.Pipeline

/** One scaling-measurement point in its own JVM (spawned by [[Bench]]):
  * `graft.ScaleProbe <cores> <docsPath> <nDocs> [warmupDocs] [trials]
  * [nSlices]` → prints `TPUT <docs/sec>`. With `nSlices > 0` the corpus is
  * the first nSlices `slice=<i>` subdirs of docsPath (Bench writes the
  * probe corpus sliced so budget-pressured rounds can shrink the workload
  * without regenerating it). A fresh JVM per measurement mirrors how a real
  * cluster comparison runs one spark-submit per size, and avoids
  * same-JVM contamination (GC sizing, fragmented heap, lingering pools)
  * that was measured to distort same-process reruns by 3x.
  *
  * The spawner passes `-XX:ActiveProcessorCount=<cores>` so the JVM's GC /
  * JIT / netty thread pools size for an N-core node instead of silently
  * borrowing all 32 host cores, and (round 7) `taskset`-pins the process
  * to exactly <cores> physical cores so those pools also RUN there — pool
  * sizing alone still let the 1-core probe's GC/netty/driver threads
  * execute in parallel on other host cores, a measured +33% throughput
  * inflation that depressed the reported 4x-core scaling efficiency
  * (a real 1-executor node has no such helper cores). See
  * [[BenchUtil.affinityPrefix]] for the measured numbers.
  *
  * Warm-up runs over a `warmupDocs` prefix slice (default nDocs/8, cap
  * 250k): enough to JIT the validator regex + codegen paths and populate
  * the file-listing cache, without paying a full extra pass per probe.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val Array(cores, docsPath, nDocsStr) = args.take(3)
    val nDocs = nDocsStr.toLong
    val warmupDocs =
      if (args.length > 3) args(3).toLong else math.min(nDocs / 8, 250000L)
    val trials = if (args.length > 4) args(4).toInt else 1
    val nSlices = if (args.length > 5) args(5).toInt else 0
    // finer shuffle granularity than 1/core lets AQE smooth stage tails at
    // small core counts (a 4-core stage with 4 partitions stalls on its
    // slowest partition); override via SPARK_GRAFT_PROBE_PARTS_PER_CORE
    val partsPerCore = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS_PER_CORE", "4").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toInt * partsPerCore)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
    // shuffle/spill on tmpfs when available — disk I/O variance otherwise
    // dominates the measurement on this sandbox
    if (new java.io.File("/dev/shm").isDirectory)
      builder.config("spark.local.dir", "/dev/shm/graft-probe")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val paths =
      if (nSlices > 0) (0 until nSlices).map(i => s"$docsPath/slice=$i")
      else Seq(docsPath)
    // a fresh Dataset per run: re-executing one Dataset instance would let
    // AQE reuse its materialized shuffle stages and measure nothing
    val run = () => Pipeline.violations(spark,
      spark.read.parquet(paths: _*), DocGen.schema).count()
    // JIT + listing warm-up on a prefix slice
    Pipeline.violations(spark,
      spark.read.parquet(paths: _*).limit(warmupDocs.toInt), DocGen.schema).count()
    val times = (1 to trials).map { _ =>
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }
    System.err.println(s"[probe] cores=$cores times=${times.map(t => f"$t%.2f").mkString(",")}")
    // min = capability estimator: ambient sandbox interference is strictly
    // additive noise (observed 3x swings mid-probe); see BENCH.md §2
    println(s"TPUT ${nDocs / times.min}")
    spark.stop()
  }
}
