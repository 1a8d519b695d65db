package graft.engine

import org.apache.spark.sql.SparkSession

/** The ONE SparkSession builder for the CLI entry points (ValidatorApp,
  * Compact) — identical copies had already started drifting across mains,
  * and a config tweak applied to some but not others is exactly the bug a
  * shared helper prevents. Bench/ScaleProbe keep their own builders on
  * purpose: benchmarking needs tmpfs spill, probe-specific partition
  * counts, and ERROR-level logs.
  */
object SparkBoot {

  /** `SPARK_GRAFT_MASTER` (default `local[$SPARK_GRAFT_CPUS]`, default 32
    * cpus), shuffle partitions = cpus, AQE on, UTC, no UI.
    */
  def local(logLevel: String = "WARN"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
