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

  /** Synchronous min-label propagation over the UNDIRECTED edge graph,
    * `iters` rounds: after round r, label(v) = min node id within r hops of
    * v. With iters ≥ graph diameter this is connected components (the
    * iterate-to-convergence form lives in [[Dedup.dupGroups]]); the bounded
    * form here is the k-hop community-seed primitive — and, unlike full CC,
    * it is exactly reproducible in SQL (a depth-bounded recursive CTE), so
    * it carries a cross-engine hash oracle.
    *
    * Scale shape: per round ONE neighbor-min group-count exchange + one
    * label join, both keyed on node id, lineage cut per round. `maxDegree >
    * 0` first drops nodes whose total degree exceeds it (the standard LPA
    * super-hub guard — a 10^7-degree hub makes any propagation quadratic in
    * its neighborhood; at 10^12 docs the cap is what keeps round cost
    * linear in |E|).
    */
  def minLabelPropagation(edges: DataFrame, iters: Int,
                          src: String = "src", dst: String = "dst",
                          maxDegree: Long = 0L): DataFrame = {
    val e0 = edges.select(col(src).as("a"), col(dst).as("b"))
    val e =
      if (maxDegree <= 0L) e0
      else {
        val deg = e0.select(col("a").as("node"))
          .unionByName(e0.select(col("b").as("node")))
          .groupBy("node").agg(count(lit(1)).as("d"))
        val hot = deg.filter(col("d") > maxDegree).select("node")
        e0.join(broadcast(hot), e0("a") === hot("node"), "left_anti")
          .join(broadcast(hot), e0("b") === hot("node"), "left_anti")
      }
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    val nodes = sym.select(col("a").as("node")).distinct()
    var labels = nodes.withColumn("label", col("node")).localCheckpoint()
    for (_ <- 1 to iters) {
      val nbrMin = sym.join(labels, sym("b") === labels("node"))
        .groupBy(sym("a").as("node")).agg(min(col("label")).as("nl"))
      labels = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** HITS (Kleinberg) by power iteration: hub(v) = Σ_out auth(w), auth(v) =
    * Σ_in hub(u), each L2-normalized per half-step. Returns (node, hub,
    * auth). Same per-round shape as [[pageRank]] — keyed exchanges on node
    * id, scalar-only collects (the two norms), lineage cut per round.
    * FP scores → spec-verified against a driver-computed reference; the
    * exact-integer opening steps are oracle-able via [[hitsTwoStepInts]].
    */
  def hits(edges: DataFrame, iters: Int = 10,
           src: String = "src", dst: String = "dst"): DataFrame = {
    val e = edges.select(col(src).as("esrc"), col(dst).as("edst")).localCheckpoint()
    val nodes = e.select(col("esrc").as("node"))
      .unionByName(e.select(col("edst").as("node")))
      .distinct().localCheckpoint()
    var scores = nodes.select(col("node"), lit(1.0).as("hub"), lit(1.0).as("auth"))
      .localCheckpoint()
    // norm aggregates coalesce to 0.0 (an empty edge frame yields a null
    // sum, as pageRank's dangling-mass collect already handles) and a zero
    // norm short-circuits: the iteration has dried — dividing by it would
    // turn every score into NaN (or NPE on the empty frame)
    var dry = false
    for (_ <- 1 to iters if !dry) {
      val authRaw = e.join(scores, e("esrc") === scores("node"))
        .groupBy(col("edst").as("node")).agg(sum(col("hub")).as("raw"))
      val authSq = authRaw.agg(coalesce(sum(col("raw") * col("raw")), lit(0.0)))
        .collect()(0).getDouble(0)
      if (authSq == 0.0) dry = true
      else {
        val authN = math.sqrt(authSq)
        val auth = authRaw.select(col("node"), (col("raw") / lit(authN)).as("auth"))
        val hubRaw = e.join(auth, e("edst") === auth("node"))
          .groupBy(col("esrc").as("node")).agg(sum(col("auth")).as("raw"))
        val hubSq = hubRaw.agg(coalesce(sum(col("raw") * col("raw")), lit(0.0)))
          .collect()(0).getDouble(0)
        if (hubSq == 0.0) dry = true
        else {
          val hubN = math.sqrt(hubSq)
          val hub = hubRaw.select(col("node"), (col("raw") / lit(hubN)).as("hub"))
          scores = nodes
            .join(hub, Seq("node"), "left").join(auth, Seq("node"), "left")
            .select(col("node"), coalesce(col("hub"), lit(0.0)).as("hub"),
              coalesce(col("auth"), lit(0.0)).as("auth"))
            .localCheckpoint()
        }
      }
    }
    scores
  }

  /** The exact-integer opening of HITS (init hub=1, no normalization):
    * auth1(v) = in-degree(v); hub1(v) = Σ_out auth1(w); auth2(v) = Σ_in
    * hub1(u). Every value is a BIGINT sum of counts — the cross-engine
    * oracle twin that pins [[hits]]'s join/agg shape.
    */
  def hitsTwoStepInts(edges: DataFrame,
                      src: String = "src", dst: String = "dst"): DataFrame = {
    val e = edges.select(col(src).as("esrc"), col(dst).as("edst"))
    val auth1 = e.groupBy(col("edst").as("node")).agg(count(lit(1)).as("auth1"))
    val hub1 = e.join(auth1, e("edst") === auth1("node"))
      .groupBy(col("esrc").as("node")).agg(sum(col("auth1")).as("hub1"))
    val auth2 = e.join(hub1, e("esrc") === hub1("node"))
      .groupBy(col("edst").as("node")).agg(sum(col("hub1")).as("auth2"))
    val nodes = e.select(col("esrc").as("node"))
      .unionByName(e.select(col("edst").as("node"))).distinct()
    nodes.join(auth1, Seq("node"), "left").join(hub1, Seq("node"), "left")
      .join(auth2, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("auth1"), lit(0L)).as("auth1"),
        coalesce(col("hub1"), lit(0L)).as("hub1"),
        coalesce(col("auth2"), lit(0L)).as("auth2"))
  }

  /** The document link graph from the spans table: one edge per
    * (doc, media_ref) span of the given kinds.
    */
  def refEdges(docs: DataFrame, kinds: Seq[String] = Seq("med:link")): DataFrame =
    docs.select(col("doc_id").as("src"), explode(col("spans")).as("s"))
      .filter(col("s.media_ref").isNotNull && col("s.kind").isin(kinds: _*))
      .select(col("src"), col("s.media_ref").as("dst"))
}
