package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.model.SchemaDef
import graft.validators.ScalaValidators

/** All subject-local constraint checks (domain, datatype conformance,
  * cardinality incl. zero-cases, some, only) evaluated in ONE native
  * codegen'd expression over the spans array.
  *
  * Why: the higher-order-function formulation (RowLocalCheck.violArray) is
  * CodegenFallback — interpreted per span, allocation-heavy, and it stops
  * scaling past ~8 local cores (GC pressure). This expression makes one
  * tight pass per row: compiled regex validators, primitive counters, and a
  * single output array. Semantics are IDENTICAL to the HOF path — asserted
  * by the golden spec's three-way equality (fused / unfused / native).
  *
  * Output: array<struct<checkId,kind,value,expected,check>> where `check`
  * is the owning check family id (for per-check verdict rollups).
  */
case class ValidateSpans(child: Expression, constraints: CompiledConstraints)
  extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = ValidateSpans.OutType

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Any])
    else ValidateSpans.compute(v.asInstanceOf[ArrayData], constraints)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("graftConstraints", constraints,
      classOf[CompiledConstraints].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (${childGen.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  ${ev.value} = graft.functions.ValidateSpans.compute(${childGen.value}, $ref);
         |}
       """.stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ValidateSpans =
    copy(child = newChild)

  override def prettyName: String = "validate_spans"
}

/** Driver-compiled, serializable form of the subject-local constraint set.
  * Validators are compiled `String => Boolean` closures over precompiled
  * regex patterns ([[ScalaValidators]]); class sets are hash sets.
  */
final case class CompiledConstraints(
    // datatype kind -> (expected datatype uri, validator)
    dtKinds: Map[String, (String, String => Boolean)],
    // kind -> allowed subject classes (domain closure)
    domainKinds: Map[String, Set[String]],
    // (classSet, prop, rtype, n) for data-range/unqualified min/max/exact
    cards: Seq[(Set[String], String, String, Int)],
    // (classSet, prop, dataRange, validator) for some
    somes: Seq[(Set[String], String, String, String => Boolean)],
    // (classSet, prop, dataRange, validator) for only
    onlys: Seq[(Set[String], String, String, String => Boolean)]
) extends Serializable

object CompiledConstraints {
  /** Compile the subsystems named in `enable` (check ids of the five
    * row-local checks); others come out empty so a configured subset of the
    * pipeline behaves identically in native mode.
    */
  def from(schema: SchemaDef,
           enable: Set[String] = Set("OBJECT-DATATYPE-PROPERTIES-DOMAIN",
             "DATATYPE-PROPERTIES-DATATYPE", "OWL-RESTRICTION-CARD",
             "OWL-RESTRICTION-SOME", "OWL-RESTRICTION-ONLY")): CompiledConstraints = {
    def closure(c: String): Set[String] =
      schema.subClosure.getOrElse(c, Set(c))
    CompiledConstraints(
      dtKinds = if (!enable.contains("DATATYPE-PROPERTIES-DATATYPE")) Map.empty
        else schema.kinds.filter(k => k.kindType == "datatype" && k.range != null)
          .map(k => k.kind -> (k.range, ScalaValidators.validatorFor(schema, k.range))).toMap,
      domainKinds = if (!enable.contains("OBJECT-DATATYPE-PROPERTIES-DOMAIN")) Map.empty
        else schema.kinds.filter(_.domain.nonEmpty)
          .map(k => k.kind -> k.domain.flatMap(closure).toSet).toMap,
      cards = if (!enable.contains("OWL-RESTRICTION-CARD")) Nil
        else schema.restrictions
          .filter(r => Set("min", "max", "exact").contains(r.rtype) && r.classExpr == null)
          .map(r => (closure(r.onClass), r.onProperty, r.rtype, r.n)),
      somes = if (!enable.contains("OWL-RESTRICTION-SOME")) Nil
        else schema.restrictions.filter(r => r.rtype == "some" && r.dataRange != null)
          .map(r => (closure(r.onClass), r.onProperty, r.dataRange,
            ScalaValidators.validatorFor(schema, r.dataRange))),
      onlys = if (!enable.contains("OWL-RESTRICTION-ONLY")) Nil
        else schema.restrictions.filter(r => r.rtype == "only" && r.dataRange != null)
          .map(r => (closure(r.onClass), r.onProperty, r.dataRange,
            ScalaValidators.validatorFor(schema, r.dataRange)))
    )
  }
}

object ValidateSpans {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("checkId", StringType), StructField("kind", StringType),
    StructField("value", StringType), StructField("expected", StringType),
    StructField("check", StringType))), containsNull = false)

  private val DT = "DATATYPE-PROPERTIES-DATATYPE"
  private val DOM = "OBJECT-DATATYPE-PROPERTIES-DOMAIN"
  private val CARD = "OWL-RESTRICTION-CARD"
  private val SOME_ = "OWL-RESTRICTION-SOME"
  private val ONLY = "OWL-RESTRICTION-ONLY"

  private def row(checkId: String, kind: String, value: String,
                  expected: String, check: String): InternalRow =
    InternalRow(UTF8String.fromString(checkId), UTF8String.fromString(kind),
      if (value == null) null else UTF8String.fromString(value),
      UTF8String.fromString(expected), UTF8String.fromString(check))

  /** Referenced from generated code — must stay public.
    * spans struct layout: (kind string, text string, media_ref string,
    * offset int) — field ordinals 0..3.
    */
  def compute(spans: ArrayData, cc: CompiledConstraints): ArrayData = {
    val n = spans.numElements()
    val out = new java.util.ArrayList[InternalRow](4)

    // pass 1: class + per-prop counts needed by card/some
    var cls: String = null
    var i = 0
    while (i < n && cls == null) {
      val s = spans.getStruct(i, 4)
      if (!s.isNullAt(0) && s.getUTF8String(0).toString == SchemaDef.TypeKind) {
        cls = if (s.isNullAt(1)) null else s.getUTF8String(1).toString
      }
      i += 1
    }
    val clsOrThing = if (cls == null) SchemaDef.OWL_THING else cls

    // pass 2: span-wise datatype validation + domain usage + counts
    val cardCounts = new Array[Int](cc.cards.length)
    val someCounts = new Array[Int](cc.somes.length)
    val someValid = new Array[Boolean](cc.somes.length)
    var badDomainKinds: java.util.LinkedHashSet[String] = null

    i = 0
    while (i < n) {
      val s = spans.getStruct(i, 4)
      val kind = if (s.isNullAt(0)) null else s.getUTF8String(0).toString
      if (kind != null) {
        val text = if (s.isNullAt(1)) null else s.getUTF8String(1).toString

        // datatype conformance
        if (text != null) {
          val dt = cc.dtKinds.getOrElse(kind, null)
          if (dt != null && !dt._2(text)) {
            out.add(row(s"$DT-100", kind, text, dt._1, DT))
          }
        }

        // domain
        val allowed = cc.domainKinds.getOrElse(kind, null)
        if (allowed != null && !allowed.contains(clsOrThing)) {
          if (badDomainKinds == null) badDomainKinds = new java.util.LinkedHashSet[String]()
          badDomainKinds.add(kind)
        }

        // cardinality / some counters
        var c = 0
        while (c < cc.cards.length) {
          if (cc.cards(c)._2 == kind) cardCounts(c) += 1
          c += 1
        }
        c = 0
        while (c < cc.somes.length) {
          val so = cc.somes(c)
          if (so._2 == kind) {
            someCounts(c) += 1
            if (!someValid(c) && text != null && so._4(text)) someValid(c) = true
          }
          c += 1
        }

        // only: offending values
        var o = 0
        while (o < cc.onlys.length) {
          val on = cc.onlys(o)
          if (on._2 == kind && on._1.contains(clsOrThing) &&
            !(text != null && on._4(text))) {
            out.add(row(s"$ONLY-100", kind, text, on._3, ONLY))
          }
          o += 1
        }
      }
      i += 1
    }

    if (badDomainKinds != null) {
      val it = badDomainKinds.iterator()
      while (it.hasNext) {
        out.add(row(s"$DOM-100", it.next(), clsOrThing,
          "subject class in kind's domain", DOM))
      }
    }

    var c = 0
    while (c < cc.cards.length) {
      val (classes, prop, rtype, nn) = cc.cards(c)
      if (classes.contains(clsOrThing)) {
        val cnt = cardCounts(c)
        rtype match {
          case "max" if cnt > nn =>
            out.add(row("OWL-RESTRICTION-MAX-100", prop, cnt.toString,
              s"at most $nn $prop", CARD))
          case "min" if cnt > 0 && cnt < nn =>
            out.add(row("OWL-RESTRICTION-MIN-100", prop, cnt.toString,
              s"at least $nn $prop", CARD))
          case "min" if cnt == 0 =>
            out.add(row("OWL-RESTRICTION-MIN-102", prop, cnt.toString,
              s"at least $nn $prop", CARD))
          case "exact" if cnt > 0 && cnt != nn =>
            out.add(row("OWL-RESTRICTION-EXACT-100", prop, cnt.toString,
              s"exactly $nn $prop", CARD))
          case "exact" if cnt == 0 && nn != 0 =>
            out.add(row("OWL-RESTRICTION-EXACT-102", prop, cnt.toString,
              s"exactly $nn $prop", CARD))
          case _ =>
        }
      }
      c += 1
    }

    c = 0
    while (c < cc.somes.length) {
      val (classes, prop, dataRange, _) = cc.somes(c)
      if (classes.contains(clsOrThing)) {
        if (someCounts(c) == 0)
          out.add(row(s"$SOME_-100", prop, null,
            s"some $dataRange value for $prop", SOME_))
        else if (!someValid(c))
          out.add(row(s"$SOME_-102", prop, null,
            s"some valid $dataRange value for $prop", SOME_))
      }
      c += 1
    }

    new GenericArrayData(out.toArray)
  }

  /** Column entry point over the spans column. */
  def validateSpans(spans: Column, cc: CompiledConstraints): Column =
    shims.column(ValidateSpans(shims.expression(spans), cc))
}
