package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NearestCentroid

/** IVF (inverted-file) approximate nearest-neighbor index over an embedding
  * column — the coarse-quantizer scale path for similarity search (the
  * LSH path is [[Similarity.annTopK]]).
  *
  * Spark-native shape:
  *  - training: deterministic hash-ordered seeding + Lloyd iterations, each
  *    ONE distributed pass (assignment via the native
  *    [[graft.functions.NearestCentroid]] expression, centroid update via
  *    posexplode + groupBy(cluster, dim) avg — the C×D result collects to
  *    the driver, KBs);
  *  - query: rank centroids driver-side, scan only the nProbe nearest
  *    clusters (a partition-prunable filter when the corpus is written
  *    partitioned by cluster), exact-cosine rescore.
  */
object Ivf {

  final case class IvfModel(centroids: Array[Array[Double]]) {
    def normalized: Array[Array[Double]] = centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n > 0) c.map(_ / n) else c
    }
  }

  private def vecD(col0: String) = transform(col(col0), _.cast("double"))

  /** Train C centroids with `iters` Lloyd iterations. Deterministic: seeds
    * are the C rows with the smallest xxhash64(id).
    */
  def train(emb: DataFrame, c: Int, iters: Int = 3,
            id: String = "vec_id", vec: String = "embedding"): IvfModel = {
    val seeds = emb.orderBy(xxhash64(col(id))).limit(c)
      .select(vecD(vec).as("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    var model = IvfModel(seeds)
    for (_ <- 1 to iters) {
      val assigned = emb.select(
        NearestCentroid.nearestCentroid(vecD(vec), model.normalized).as("cluster"),
        posexplode(vecD(vec)).as(Seq("dim", "x")))
      val means = assigned.groupBy("cluster", "dim").agg(avg("x").as("m"))
        .collect()
      val dims = means.map(_.getInt(1)).max + 1
      val next = Array.tabulate(c, dims)((ci, di) => model.centroids(ci % model.centroids.length)
        .lift(di).getOrElse(0.0))
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      model = IvfModel(next)
    }
    model
  }

  /** Corpus with its IVF cluster assignment — write partitioned by
    * `cluster` for partition-pruned probes at scale.
    */
  def assign(emb: DataFrame, model: IvfModel, vec: String = "embedding"): DataFrame =
    emb.withColumn("cluster",
      NearestCentroid.nearestCentroid(vecD(vec), model.normalized))

  /** Top-k by exact cosine among the nProbe clusters nearest the query. */
  def topK(emb: DataFrame, model: IvfModel, query: Seq[Float], k: Int,
           nProbe: Int = 2, id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val q = query.map(_.toDouble).toArray
    val norm = model.normalized
    val ranked = norm.indices.sortBy { ci =>
      -q.zip(norm(ci)).map { case (a, b) => a * b }.sum
    }.take(nProbe)
    val candidates = assign(emb, model, vec)
      .filter(col("cluster").isin(ranked: _*))
    Similarity.bruteTopK(candidates, query, k, id, vec)
  }
}
