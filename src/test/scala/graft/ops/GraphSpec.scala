package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {

  // A→B, A→C, B→C, C→A, C→D; D dangling (no out-edges)
  private val edgeList = Seq(
    ("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("C", "D"))

  test("degrees: out/in per node, zero-filled over the full node universe") {
    val session = spark
    import session.implicits._
    val d = Graph.degrees(edgeList.toDF("src", "dst")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d == Map(
      "A" -> ((2L, 1L)), "B" -> ((1L, 1L)),
      "C" -> ((2L, 2L)), "D" -> ((0L, 1L))), d.toString)
  }

  test("pageRank matches a driver-side reference power iteration exactly") {
    val session = spark
    import session.implicits._
    val iters = 10
    val d = 0.85
    // reference implementation: same formula, plain Scala
    val nodes = edgeList.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val outDeg = edgeList.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outDeg.contains).map(rank).sum
      val inflow = edgeList.groupBy(_._2).view.mapValues(
        _.map(e => rank(e._1) / outDeg(e._1)).sum).toMap
      rank = nodes.map(v => v ->
        ((1.0 - d) / n + d * (inflow.getOrElse(v, 0.0) + dangling / n))).toMap
    }

    val got = Graph.pageRank(edgeList.toDF("src", "dst"), iters, d).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == rank.keySet)
    rank.foreach { case (v, r) =>
      assert(math.abs(got(v) - r) < 1e-9, s"$v: got ${got(v)} want $r")
    }
    // mass conserved: Σ rank = 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // sanity: C receives from A and B and should outrank the dangling D
    assert(got("C") > got("D"))
  }

  test("pageRank tolL1 early-exit lands within tolerance of the converged ranks") {
    val session = spark
    import session.implicits._
    val e = edgeList.toDF("src", "dst")
    val full = Graph.pageRank(e, iters = 60).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val early = Graph.pageRank(e, iters = 60, tolL1 = 1e-8).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the early-exit round's L1 delta was < 1e-8, so the remaining drift
    // to the 60-round fixpoint is bounded by the geometric tail of the
    // damping factor: 1e-8 / (1 - 0.85)
    full.foreach { case (v, r) =>
      assert(math.abs(early(v) - r) < 1e-7, s"$v: early ${early(v)} vs $r")
    }
    assert(math.abs(early.values.sum - 1.0) < 1e-9, "mass conserved")
    // and with tolL1 = 0 the fixed-round deterministic shape is unchanged
    val fixed = Graph.pageRank(e, iters = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val fixed0 = Graph.pageRank(e, iters = 10, tolL1 = 0.0).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fixed == fixed0)
  }
}
