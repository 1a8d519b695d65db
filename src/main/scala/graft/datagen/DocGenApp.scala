package graft.datagen

import org.apache.spark.sql.SparkSession

/** CLI corpus generator: `runMain graft.datagen.DocGenApp <n> <outPath>`.
  * Writes the synthesized interleaved documents table as parquet,
  * repartitioned by a doc_id hash so downstream bucket verdicts align with
  * file layout.
  */
object DocGenApp {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val out = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    DocGen.documents(spark, n).toDF().write.mode("overwrite").parquet(out)
    println(s"[docgen] wrote $n docs to $out")
    spark.stop()
  }
}
