package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** argmax-cosine centroid assignment as a native codegen'd expression: the
  * centroid matrix rides along as a reference object (broadcast-free — it
  * serializes with the plan, KBs for any sane C×D), and assignment is one
  * tight C×D loop per row.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid requires array<double>, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.compute(input.asInstanceOf[ArrayData].toDoubleArray(), centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCentroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroid.compute($c.toDoubleArray(), $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {

  /** Cosine argmax over L2-normalized centroids (callers normalize). */
  def compute(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var norm = 0.0
    var d = 0
    while (d < v.length) { norm += v(d) * v(d); d += 1 }
    val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 0.0
    var best = -1
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var dot = 0.0
      d = 0
      val dims = math.min(v.length, ctr.length)
      while (d < dims) { dot += v(d) * ctr(d); d += 1 }
      val score = dot * inv
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    shims.column(NearestCentroid(shims.expression(v), centroids))
}
