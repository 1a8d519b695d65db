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

/** `collect_set` with a HARD state bound: gathers distinct non-null string
  * values until the set would exceed `maxSize`, then saturates — the
  * buffer keeps exactly `maxSize + 1` entries as the overflow witness and
  * stops growing. `eval` returns the sorted distinct values when the bound
  * held, or NULL when it overflowed.
  *
  * This is the categorical value-set fetch the way a 10^12-row scan needs
  * it: Spark's `collect_set` holds EVERY distinct value in each partial
  * aggregation buffer, so a mis-classified high-cardinality column (an
  * HLL undercount at the [[graft.stats.Suggest]] boundary, a bad column
  * pick) turns the "small" fetch into executor-OOM state. Here the state
  * can never exceed maxSize+1 strings per buffer regardless of the data,
  * update is O(1) after saturation, and overflow is an explicit, exact
  * verdict (NULL) rather than a silently huge result. Which maxSize+1
  * values the saturated buffer happens to hold is arrival-order-dependent
  * — irrelevant, because a saturated buffer only ever evals to NULL; the
  * non-overflowed result is exactly the distinct set (deterministic).
  *
  * Map-side combinable like any TypedImperativeAggregate; merge unions
  * until saturation, so partial overflow anywhere forces final overflow —
  * exactly the semantics "distinct count > maxSize" requires.
  */
case class BoundedSetAgg(
    child: Expression,
    maxSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[String]]
  with UnaryLike[Expression] {

  require(maxSize >= 1, s"maxSize must be positive, got $maxSize")

  override def createAggregationBuffer(): java.util.HashSet[String] =
    new java.util.HashSet[String]()

  private def offer(s: java.util.HashSet[String], v: String): Unit =
    if (s.size <= maxSize) s.add(v) // size == maxSize+1 marks saturation

  override def update(buffer: java.util.HashSet[String],
                      input: InternalRow): java.util.HashSet[String] = {
    val v = child.eval(input)
    if (v != null) offer(buffer, v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: java.util.HashSet[String],
                     other: java.util.HashSet[String]): java.util.HashSet[String] = {
    // draining other fully either keeps the union ≤ maxSize or saturates
    // the buffer; a saturated other (maxSize+1 entries) can never drain
    // into an unsaturated buffer (the union would exceed maxSize first),
    // so overflow anywhere propagates to the final verdict
    val it = other.iterator()
    while (it.hasNext && buffer.size <= maxSize) offer(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.HashSet[String]): Any =
    if (buffer.size > maxSize) null
    else {
      val arr = buffer.toArray(new Array[String](buffer.size)).sorted
      new GenericArrayData(arr.map(UTF8String.fromString).asInstanceOf[Array[Any]])
    }

  override def serialize(buffer: java.util.HashSet[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) {
      val b = it.next().getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      s.add(new String(b, StandardCharsets.UTF_8))
      i += 1
    }
    s
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bounded_set"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedSetAgg =
    copy(child = newChild)
}

object BoundedSetAgg {
  /** `df.agg(boundedSet($"c", k))`: sorted distinct values, or NULL when
    * the column holds more than `k` distinct non-null values.
    */
  def boundedSet(c: Column, maxSize: Int): Column =
    shims.column(
      BoundedSetAgg(shims.expression(c.cast("string")), maxSize).toAggregateExpression())
}
