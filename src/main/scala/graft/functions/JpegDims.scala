package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** JPEG dimensions by SOF-marker walk — native codegen'd expression, no
  * codec library. JPEG puts width/height inside a Start-Of-Frame segment at
  * a VARIABLE offset (after any APPn/COM/DQT/... segments), so unlike
  * PNG/GIF fixed-offset fields ([[graft.ops.Multimodal.imageDims]]) the
  * parse is a bounded walk over segment length fields: each non-SOF segment
  * declares its own BE-u16 length, SOFn (C0–CF minus C4/C8/CC) carries
  * height at +5 and width at +7. The walk touches only header bytes (stops
  * at SOS — dimensions always precede entropy-coded data), is row-local,
  * and returns null for anything malformed or truncated: reporting garbage
  * dims for exactly the malformed inputs a validation pass exists to catch
  * would be the bug.
  */
case class JpegDims(child: Expression)
  extends UnaryExpression with UnaryLike[Expression] {

  // fields nullable to coerce cleanly with the PNG/GIF CASE branches in
  // Multimodal.imageDims (their conv()-built fields are nullable)
  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    JpegDims.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JpegDims.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)

  override def prettyName: String = "jpeg_dims"
}

object JpegDims {

  /** Segments a well-formed header can reasonably hold before SOF (JFIF +
    * EXIF + ICC chunks + tables); a walk that exceeds it is malformed or
    * adversarial — bail, never loop unboundedly on untrusted bytes.
    */
  val MaxSegments = 64

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Referenced from generated code — must stay public. Returns
    * InternalRow(width, height) or null.
    */
  def compute(bytes: Array[Byte]): InternalRow = {
    val len = bytes.length
    // SOI
    if (len < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return null
    var i = 2
    var seg = 0
    while (seg < MaxSegments) {
      // optional fill bytes: any number of 0xFF may pad before a marker
      while (i + 1 < len && (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xff)
        i += 1
      if (i + 3 >= len || (bytes(i) & 0xff) != 0xff) return null
      val code = bytes(i + 1) & 0xff
      val isSof = code >= 0xc0 && code <= 0xcf &&
        code != 0xc4 && code != 0xc8 && code != 0xcc
      if (isSof) {
        // FF Cx | len(2) | precision(1) | height BE-u16 | width BE-u16
        if (i + 8 >= len || be16(bytes, i + 2) < 8) return null
        return new GenericInternalRow(Array[Any](
          be16(bytes, i + 7).toLong, be16(bytes, i + 5).toLong))
      }
      if (code == 0xda || code == 0xd9) return null // SOS/EOI before any SOF
      if (code == 0x01 || (code >= 0xd0 && code <= 0xd7)) {
        i += 2 // standalone markers carry no length field
      } else {
        val segLen = be16(bytes, i + 2)
        if (segLen < 2) return null
        i += 2 + segLen
      }
      seg += 1
    }
    null
  }

  def jpegDims(bin: Column): Column = shims.column(JpegDims(shims.expression(bin)))
}
