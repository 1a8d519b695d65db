package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonical-composition pass every web-curation pipeline runs before
  * tokenizing / fingerprinting (CCNet, FineWeb), so that `é` and
  * `e`+COMBINING ACUTE fingerprint identically. Spark has no built-in
  * normalizer and a Scala UDF would break whole-stage codegen, so this is
  * the repo-standard native-expression shape (same as [[CharNgrams]]).
  *
  * Already-normalized text (the overwhelming majority of real input) is
  * detected with `Normalizer.isNormalized` — a cheap quick-check scan — and
  * returned as the ORIGINAL UTF8String, skipping both the String round-trip
  * allocation and the compose pass on the hot path.
  *
  * Cross-engine: `java.text.Normalizer` (ICU-aligned) and DuckDB's
  * utf8proc `nfc_normalize` implement the same Unicode canonical
  * composition — the `q_unicode_clean` oracle pins them against each other
  * over seeded decomposed sequences.
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = StringType

  // reject non-string children at ANALYSIS time (ExpectsInputTypes is not
  // nameable outside org.apache.spark.sql — AbstractDataType is
  // private[sql] — so the repo convention is checkInputDataTypes, as in
  // MinHashSig)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Referenced from generated code — must stay public. */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  def nfcNormalize(text: Column): Column =
    shims.column(NfcNormalize(shims.expression(text)))
}
