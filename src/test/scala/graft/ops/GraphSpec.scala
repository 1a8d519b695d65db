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

  test("minLabelPropagation: label after r rounds = min node id within r hops") {
    val session = spark
    import session.implicits._
    // path graph E-F-G-H plus the cyclic component above; undirected hops
    val e = (edgeList ++ Seq(("E", "F"), ("F", "G"), ("G", "H"))).toDF("src", "dst")
    def run(iters: Int): Map[String, String] =
      Graph.minLabelPropagation(e, iters).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    // 1 hop: H sees G; G sees F; F sees E
    assert(run(1) == Map("A" -> "A", "B" -> "A", "C" -> "A", "D" -> "C",
      "E" -> "E", "F" -> "E", "G" -> "F", "H" -> "G"))
    // 2 hops: D reaches A via C; G reaches E; H reaches F
    assert(run(2) == Map("A" -> "A", "B" -> "A", "C" -> "A", "D" -> "A",
      "E" -> "E", "F" -> "E", "G" -> "E", "H" -> "F"))
    // 3 hops = diameter: both components fully labeled
    assert(run(3) == Map("A" -> "A", "B" -> "A", "C" -> "A", "D" -> "A",
      "E" -> "E", "F" -> "E", "G" -> "E", "H" -> "E"))
  }

  test("minLabelPropagation maxDegree drops super-hubs and their edges") {
    val session = spark
    import session.implicits._
    // X is a degree-3 hub joining two otherwise-separate pairs
    val e = Seq(("A", "X"), ("B", "X"), ("C", "X"), ("A", "B"))
      .toDF("src", "dst")
    val got = Graph.minLabelPropagation(e, iters = 5, maxDegree = 2L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // X (degree 3) removed → only the A-B edge survives; C drops out of the
    // node universe entirely (its only edge touched the hub)
    assert(got == Map("A" -> "A", "B" -> "A"))
  }

  test("hits matches a driver-side reference power iteration; two-step ints are exact") {
    val session = spark
    import session.implicits._
    val e = edgeList.toDF("src", "dst")
    val iters = 5
    val nodes = edgeList.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val aRaw = nodes.map(v => v -> edgeList.filter(_._2 == v).map(t => hub(t._1)).sum).toMap
      val aN = math.sqrt(aRaw.values.map(x => x * x).sum)
      auth = aRaw.view.mapValues(_ / aN).toMap
      val hRaw = nodes.map(v => v -> edgeList.filter(_._1 == v).map(t => auth(t._2)).sum).toMap
      val hN = math.sqrt(hRaw.values.map(x => x * x).sum)
      hub = hRaw.view.mapValues(_ / hN).toMap
    }
    val got = Graph.hits(e, iters).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { v =>
      assert(math.abs(got(v)._1 - hub(v)) < 1e-9, s"hub $v")
      assert(math.abs(got(v)._2 - auth(v)) < 1e-9, s"auth $v")
    }
    // C is the structural authority (in from A and B)
    assert(auth("C") == nodes.map(auth).max)

    val ints = Graph.hitsTwoStepInts(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // auth1 = indegree; hub1 = Σ_out auth1(dst); auth2 = Σ_in hub1(src)
    assert(ints == Map(
      "A" -> ((1L, 3L, 2L)), // out: B(1)+C(2)=3; in: C with hub1(C)=2
      "B" -> ((1L, 2L, 3L)), // out: C(2); in: A with hub1(A)=3
      "C" -> ((2L, 2L, 5L)), // out: A(1)+D(1)=2; in: A(3)+B(2)=5
      "D" -> ((1L, 0L, 2L))), ints.toString)
  }

  test("hits on an empty edge frame returns the empty scores frame (no NPE)") {
    val session = spark
    import session.implicits._
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    val got = Graph.hits(empty, iters = 3).collect()
    assert(got.isEmpty)
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
