package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a `TypedImperativeAggregate`: at
  * most `k` (item → counter) entries per aggregation state, map-side
  * combined — the one-pass alternative to a full corpus-wide
  * `groupBy(term)` when only the heavy tail matters. The classic MG
  * guarantee carries through merges (Agarwal et al., "Mergeable
  * Summaries"): every item with true frequency > N/(k+1) is PRESENT in
  * the final summary, and each reported counter underestimates the true
  * count by at most N/(k+1).
  *
  * Counters (and therefore the exact item SET at the margin) depend on
  * arrival/merge order, so the sketch itself is not hash-oracle-able;
  * [[graft.ops.Ranking.heavyHitterTerms]] composes it with an exact-count
  * verify pass whose result IS provably exact — the Bloom-decontamination
  * discipline (approximate prefilter, exact verify, exact result).
  *
  * Result: array<struct<item, est>> sorted by (est desc, item) —
  * deterministic rendering of whatever final state the merges produced.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def offer(m: java.util.HashMap[String, Long], item: String, w: Long): Unit = {
    if (m.containsKey(item)) m.put(item, m.get(item) + w)
    else if (m.size < k) m.put(item, w)
    else {
      // decrement-all by the smallest of (w, min counter) repeatedly is
      // O(k^2); the standard one-shot: decrement all by d = min(w, min),
      // drop zeros, then re-offer the remainder if any survives
      var rem = w
      while (rem > 0 && !m.containsKey(item) && m.size >= k) {
        var min = Long.MaxValue
        val it0 = m.values().iterator()
        while (it0.hasNext) { val v = it0.next(); if (v < min) min = v }
        val d = math.min(rem, min)
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - d
          if (nv <= 0L) it.remove() else e.setValue(nv)
        }
        rem -= d
      }
      if (rem > 0) offer(m, item, rem)
    }
  }

  override def update(buffer: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buffer, v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(buffer: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); offer(buffer, e.getKey, e.getValue) }
    buffer
  }

  override def eval(buffer: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buffer.size)
    val it = buffer.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m.put(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

object HeavyHittersAgg {
  /** `df.agg(heavyHitters($"term", k))` — MG summary, (est desc, item). */
  def heavyHitters(c: Column, k: Int): Column =
    shims.column(
      HeavyHittersAgg(shims.expression(c.cast("string")), k).toAggregateExpression())
}
