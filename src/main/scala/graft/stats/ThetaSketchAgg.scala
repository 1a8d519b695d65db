package graft.stats

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Theta sketch aggregate — the SET-OPERATION member of the engine's
  * mergeable-sketch family (KLL = quantiles, HLL = cardinality,
  * frequent-items = heavy hitters; theta adds intersection and
  * difference): a DataSketches theta sketch of the column's distinct
  * string values, serialized compact. Unlike HLL, two theta sketches
  * support `A ∩ B` and `A \\ B` estimates ([[ThetaStats]]), which is what
  * snapshot-over-snapshot VOCABULARY CHURN needs — how many distinct
  * values appeared/disappeared between two corpora — without holding
  * either value set.
  *
  * Exactness contract: while a sketch retains fewer than `nominalEntries`
  * hashes it is in EXACT mode (theta = 1, no sampling) — estimates,
  * intersections and differences are exact integers, the regime the
  * DuckDB oracle pins (`q_vocab_churn`); beyond it estimates carry the
  * documented relative standard error ≈ 1/sqrt(nominalEntries)
  * (ThetaSketchSpec bounds it). Same `TypedImperativeAggregate` frame as
  * [[KllSketchAgg]]: map-side combine, KB-sized shuffled state.
  *
  * NULL values are skipped.
  */
case class ThetaSketchAgg(
    child: Expression,
    nominalEntries: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(nominalEntries >= 16 && (nominalEntries & (nominalEntries - 1)) == 0,
    s"nominalEntries=$nominalEntries must be a power of 2 >= 16")

  // a Union buffer accepts raw item updates AND sketch merges — one
  // buffer type serves both aggregate phases
  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(ThetaSketchAgg.escape(v.toString))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

object ThetaSketchAgg {
  /** DataSketches `update(String)` silently REJECTS the empty string
    * (like null), which would erase "" from every set estimate — a real
    * value in a vocabulary (an empty lang tag IS the anomaly to catch).
    * Injective escape: "" → NUL, and a NUL-prefixed value gains one more
    * NUL, so distinctness is preserved for every input (found by
    * SketchPropertySpec's grouping-invariance fuzz).
    */
  private[stats] def escape(s: String): String =
    if (s.isEmpty) "\u0000"
    else if (s.charAt(0) == '\u0000') "\u0000" + s
    else s

  /** `df.agg(theta_sketch($"v"))` — serialized theta sketch of distincts. */
  def theta_sketch(c: Column, nominalEntries: Int = 4096): Column =
    shims.column(
      ThetaSketchAgg(shims.expression(c.cast("string")), nominalEntries)
        .toAggregateExpression())
}

/** Merges a column of SERIALIZED theta sketch blobs — the stored-directory
  * path ([[KllMergeAgg]]'s pattern on the set plane): per-day/per-source
  * value-set sketches union without rescanning raw rows. Null/empty blobs
  * are skipped.
  */
case class ThetaMergeAgg(
    child: Expression,
    nominalEntries: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(nominalEntries >= 16 && (nominalEntries & (nominalEntries - 1)) == 0,
    s"nominalEntries=$nominalEntries must be a power of 2 >= 16")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      if (bytes.nonEmpty)
        buffer.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaMergeAgg =
    copy(child = newChild)
}

object ThetaMergeAgg {
  /** `blobs.agg(theta_merge($"theta"))` — union stored sketch blobs. */
  def theta_merge(c: Column, nominalEntries: Int = 4096): Column =
    shims.column(ThetaMergeAgg(shims.expression(c), nominalEntries).toAggregateExpression())
}

/** Driver-side set operations over serialized theta sketches. */
object ThetaStats {

  def sketchOf(bytes: Array[Byte]): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = sketchOf(bytes).getEstimate

  /** True iff BOTH sketches are in exact mode — every churn number below
    * is then an exact integer.
    */
  def isExact(a: Array[Byte], b: Array[Byte]): Boolean =
    !sketchOf(a).isEstimationMode && !sketchOf(b).isEstimationMode

  def intersectionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(sketchOf(a)); i.intersect(sketchOf(b))
    i.getResult.getEstimate
  }

  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB()
      .aNotB(sketchOf(a), sketchOf(b)).getEstimate

  /** Vocabulary churn between two value-set sketches: (distinct only in
    * a, only in b, common, a total, b total, exact-mode flag) — the
    * snapshot question "how many values appeared / disappeared" at sketch
    * cost.
    */
  def setChurn(a: Array[Byte], b: Array[Byte]): (Double, Double, Double, Double, Double, Boolean) =
    (aNotBEstimate(a, b), aNotBEstimate(b, a), intersectionEstimate(a, b),
      estimate(a), estimate(b), isExact(a, b))

  /** Per-GROUP vocabulary churn between two `(group, theta)` sketch
    * frames (each typically `df.groupBy(g).agg(theta_sketch(v))` or
    * merged stored blobs) — the operational form: vocabularies churn one
    * source at a time, and a source present on only one side surfaces as
    * added/removed rather than vanishing. Driver-side over the
    * group-count-sized frames (`maxGroups`-guarded); numbers are exact
    * integers whenever both sides' sketches are exact-mode (`exact`
    * column says so per group).
    */
  def setChurnByGroup(prev: DataFrame, cur: DataFrame,
                      maxGroups: Int = 100000): DataFrame = {
    val spark = prev.sparkSession
    def side(df: DataFrame): Map[String, Array[Byte]] = {
      val rows = df.limit(maxGroups + 1).collect()
      require(rows.length <= maxGroups,
        s"churn by group: more than $maxGroups groups — bound the group key")
      rows.map(r => r.get(0).toString -> r.getAs[Array[Byte]](1)).toMap
    }
    val (a, b) = (side(prev), side(cur))
    val out = (a.keySet ++ b.keySet).toSeq.sorted.map { g =>
      (a.get(g), b.get(g)) match {
        case (Some(pa), Some(pb)) =>
          val (oa, ob, c, ta, tb, ex) = setChurn(pa, pb)
          (g, "present", oa.toLong, ob.toLong, c.toLong, ta.toLong, tb.toLong, ex)
        case (Some(pa), None) =>
          val e = estimate(pa)
          (g, "removed", e.toLong, 0L, 0L, e.toLong, 0L, !sketchOf(pa).isEstimationMode)
        case (None, Some(pb)) =>
          val e = estimate(pb)
          (g, "added", 0L, e.toLong, 0L, 0L, e.toLong, !sketchOf(pb).isEstimationMode)
        case _ => sys.error("unreachable")
      }
    }
    import spark.implicits._
    out.toDF("group", "status", "only_prev", "only_cur", "common",
      "n_prev", "n_cur", "exact")
  }
}
