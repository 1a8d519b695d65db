package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Bounded top-k-by-score aggregate: the k (id, score) pairs with the
  * LARGEST scores per group, ties broken on the smaller id — as a
  * `TypedImperativeAggregate` whose state is a ≤k-entry heap, map-side
  * combined (the [[KSmallestLongsAgg]] pattern with a double ordering and
  * a carried id). This is the skew-immune replacement for `row_number()
  * OVER (PARTITION BY group ORDER BY score DESC, id)` + `rank <= k`: a
  * hot group's rows reduce map-side to k candidates per task instead of
  * sorting the whole group in one window task. Built for the per-stratum
  * A-ES weighted sample ([[graft.ops.Sampling.weightedTopKPerStratum]]),
  * but score can be any double.
  *
  * Result: array<struct<id, score>> sorted (score desc, id asc) —
  * deterministic for a given input multiset under any partitioning.
  */
case class TopKByScoreAgg(
    left: Expression,  // score: double
    right: Expression, // id: long
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](TopKByScoreAgg.WorstFirst)

  // Total order consistent with WorstFirst (java.lang.Double.compare
  // throughout): `>`/`==` are always false vs NaN, so a NaN admitted while
  // the buffer was under k could never be displaced by a valid pair —
  // results would turn arrival-order dependent. NaN is also rejected at
  // update() so it never enters the buffer at all.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    TopKByScoreAgg.WorstFirst.compare(b, a) > 0

  private def offer(buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
                    p: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(p)
    else if (better(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }

  override def update(buffer: scala.collection.mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double]))
      offer(buffer, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buffer
  }

  override def merge(buffer: scala.collection.mutable.PriorityQueue[(Double, Long)],
                     other: scala.collection.mutable.PriorityQueue[(Double, Long)]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buffer, _))
    buffer
  }

  override def eval(buffer: scala.collection.mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buffer.toArray.sortBy(p => (-p._1, p._2))
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(i, s)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: scala.collection.mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKByScoreAgg =
    copy(left = newLeft, right = newRight)
}

object TopKByScoreAgg {

  /** The queue dequeues its MAX; this orders so the max is the WORST kept
    * pair (smallest score; among equals, largest id). A concrete static
    * class, NOT `Ordering.by` — the anonymous ordering loses its captured
    * tuple-Ordering field across the expression's executor serialization
    * (observed: NPE in PriorityQueue.fixDown on the deserialized copy).
    */
  object WorstFirst extends Ordering[(Double, Long)] with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // lower score = worse = greater
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher id = worse
    }
  }

  /** `df.groupBy(g).agg(topKByScore($"score", $"id", k))`. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    shims.column(TopKByScoreAgg(
      shims.expression(score.cast("double")),
      shims.expression(id.cast("long")), k).toAggregateExpression())
}
