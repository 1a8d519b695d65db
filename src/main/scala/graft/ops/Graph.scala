package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph operators over a reference graph `(src, dst)` — for this
  * engine, the document→document `media_ref` graph (the corpus-curation
  * signal family: link-based quality scoring à la harmonic centrality /
  * PageRank over crawl graphs).
  *
  * Scale shape: degrees are two group-counts + one outer join on node id;
  * PageRank is the standard power iteration — per round THREE keyed
  * exchanges, all on node id (ranks⋈outDeg, edges⋈withDeg + the
  * contribution groupBy, nodes⟕contribs) plus one broadcast-size scalar
  * (total dangling mass), with the plan lineage cut per round exactly like
  * [[Dedup.dupGroups]]. Pre-partitioning edges and nodes by node id would
  * collapse the first and last of those into map-side joins on a real
  * cluster; the per-round scalar collect is unavoidable in any
  * distributed PageRank.
  */
object Graph {

  /** Out/in degree per node over the edge list; nodes with no edges in one
    * direction get 0 (node universe = src ∪ dst).
    */
  def degrees(edges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame = {
    val out = edges.groupBy(col(src).as("node")).agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col(dst).as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** PageRank by power iteration with uniform teleport and dangling-mass
    * redistribution: rank' = (1-d)/n + d·(Σ_in rank/outDeg + danglingMass/n).
    * Fixed `iters` rounds (deterministic shape; convergence at d=0.85 is
    * geometric, ~10-20 rounds for ranking stability). Returns (node, rank);
    * Σ rank = 1 every round. The per-round dangling-mass scalar is a tiny
    * driver-side aggregate — the standard trade every distributed PageRank
    * makes.
    *
    * `tolL1 > 0` adds a convergence early-exit: stop once the L1 delta
    * Σ|rank' − rank| drops below it (one extra scalar aggregate per round —
    * worth it when `iters` is sized pessimistically for a graph that mixes
    * fast). 0 (default) keeps the fixed-round deterministic shape.
    */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
               src: String = "src", dst: String = "dst",
               tolL1: Double = 0.0): DataFrame = {
    val e = edges.select(col(src).as("esrc"), col(dst).as("edst"))
      .localCheckpoint()
    val nodes = e.select(col("esrc").as("node"))
      .unionByName(e.select(col("edst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    val outDeg = e.groupBy(col("esrc").as("node"))
      .agg(count(lit(1)).as("out_deg")).localCheckpoint()

    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val withDeg = ranks.join(outDeg, Seq("node"), "left")
      // nodes with no out-edges leak their mass — redistribute uniformly
      val danglingMass = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0))).collect()(0).getDouble(0)
      val contribs = e
        .join(withDeg.filter(col("out_deg").isNotNull),
          e("esrc") === col("node"))
        .select(col("edst").as("node"),
          (col("rank") / col("out_deg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("inflow"), lit(0.0)) +
              lit(danglingMass / n))).as("rank"))
        .localCheckpoint()
      if (tolL1 > 0.0) {
        val delta = next.join(ranks.withColumnRenamed("rank", "prev"), "node")
          .agg(sum(abs(col("rank") - col("prev")))).collect()(0).getDouble(0)
        converged = delta < tolL1
      }
      ranks = next
    }
    ranks
  }

  /** The document link graph from the spans table: one edge per
    * (doc, media_ref) span of the given kinds.
    */
  def refEdges(docs: DataFrame, kinds: Seq[String] = Seq("med:link")): DataFrame =
    docs.select(col("doc_id").as("src"), explode(col("spans")).as("s"))
      .filter(col("s.media_ref").isNotNull && col("s.kind").isin(kinds: _*))
      .select(col("src"), col("s.media_ref").as("dst"))
}
