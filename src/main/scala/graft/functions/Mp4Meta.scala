package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MP4 / ISO-BMFF container metadata by bounded box walk — native codegen'd
  * expression, no codec library (the [[JpegDims]] pattern). Boxes are
  * `BE-u32 size | 4-char type | payload` (size 1 → BE-u64 largesize
  * follows; size 0 → box extends to end of file). The round-5 flat-Column
  * walk committed to mvhd-first layout and version-0 times, nulling every
  * `udta`/`iods`-first muxer output and every 64-bit-time file — millions
  * of silent nulls at crawl scale. This walk finds `moov` wherever it sits
  * at top level, finds `mvhd` wherever it sits among moov's children, and
  * reads BOTH mvhd versions (v0: 32-bit ctime/mtime/duration; v1: 64-bit).
  *
  * Returns struct(brand, timescale, duration) — brand from the leading
  * `ftyp`, exact integers from mvhd — or null for anything malformed or
  * truncated BEFORE the fields it reads (reporting garbage for exactly the
  * malformed inputs a validation pass exists to catch would be the bug;
  * declared box extents beyond the payload are tolerated, since the walk
  * only ever addresses bytes it actually reads). Both walks are bounded by
  * [[Mp4Meta.MaxBoxes]] — never loop unboundedly on untrusted bytes.
  */
case class Mp4Meta(child: Expression)
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType), StructField("timescale", LongType),
    StructField("duration", LongType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Mp4Meta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Mp4Meta.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
    copy(child = newChild)

  override def prettyName: String = "mp4_meta"
}

object Mp4Meta {

  /** Top-level boxes (ftyp/pdin/free/skip/sidx/... before moov) and moov
    * children (udta/iods/trak/...) a sane file holds before the target; a
    * walk exceeding it is malformed or adversarial — bail.
    */
  val MaxBoxes = 32

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def typeIs(b: Array[Byte], i: Int, t: String): Boolean =
    (b(i) & 0xff) == t.charAt(0) && (b(i + 1) & 0xff) == t.charAt(1) &&
      (b(i + 2) & 0xff) == t.charAt(2) && (b(i + 3) & 0xff) == t.charAt(3)

  /** Next-box hop size at offset `i`, or -1 for malformed/truncated.
    * 0 means "extends to end of file" (terminal — nothing can follow).
    */
  private def hopOf(b: Array[Byte], i: Int): Long = {
    val s = be32(b, i)
    if (s == 0L) 0L
    else if (s == 1L) {
      if (i + 16 > b.length) -1L
      else { val ls = be64(b, i + 8); if (ls < 16L) -1L else ls }
    } else if (s < 8L) -1L
    else s
  }

  /** Referenced from generated code — must stay public. Returns
    * InternalRow(brand UTF8String, timescale, duration) or null.
    */
  def compute(b: Array[Byte]): InternalRow = {
    val len = b.length
    // leading ftyp: size >= 16 (header + brand + minor version)
    if (len < 16 || !typeIs(b, 4, "ftyp") || be32(b, 0) < 16L) return null
    val brand = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, 8, 12))
    // top-level walk from the end of ftyp to moov
    var off: Long = be32(b, 0)
    var seg = 0
    var moov = -1L
    while (moov < 0 && seg < MaxBoxes) {
      if (off + 8 > len) return null
      if (typeIs(b, off.toInt + 4, "moov")) moov = off
      else {
        val hop = hopOf(b, off.toInt)
        // hop > len - off rejects extents past the payload BEFORE advancing:
        // a crafted largesize near 2^63 would otherwise wrap `off` negative,
        // bypass the `off + 8 > len` guard, and index negatively after toInt.
        // (len - off is overflow-free: 0 <= off <= len always holds here.)
        if (hop <= 0L || hop > len - off) return null // malformed, or to-EOF box that isn't moov
        off += hop
      }
      seg += 1
    }
    if (moov < 0) return null
    // moov child walk to mvhd (udta/iods/trak may precede it)
    var c = moov + 8
    seg = 0
    var mvhd = -1L
    while (mvhd < 0 && seg < MaxBoxes) {
      if (c + 8 > len) return null
      if (typeIs(b, c.toInt + 4, "mvhd")) mvhd = c
      else {
        val hop = hopOf(b, c.toInt)
        if (hop <= 0L || hop > len - c) return null // same overflow guard as above
        c += hop
      }
      seg += 1
    }
    if (mvhd < 0) return null
    val m = mvhd.toInt
    if (m + 9 > len) return null
    (b(m + 8) & 0xff) match {
      case 0 => // 32-bit ctime/mtime: timescale at +20, duration u32 at +24
        if (m + 28 > len) return null
        new GenericInternalRow(Array[Any](brand, be32(b, m + 20), be32(b, m + 24)))
      case 1 => // 64-bit ctime/mtime: timescale at +28, duration u64 at +32
        if (m + 40 > len) return null
        new GenericInternalRow(Array[Any](brand, be32(b, m + 28), be64(b, m + 32)))
      case _ => null
    }
  }

  def mp4Meta(bin: Column): Column = shims.column(Mp4Meta(shims.expression(bin)))
}
