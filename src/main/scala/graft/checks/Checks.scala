package graft.checks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.validators.XsdValidators

/** The reference's check inventory (SURVEY.md §2.8) re-expressed as Spark
  * plans over the `documents` table. Key inversion vs the reference: where
  * the PHP orchestrator issued one-to-three SPARQL queries *per property or
  * restriction* (classic N+1, e.g. CheckObjectPropertiesRange.php:118-313),
  * every check here is ONE declarative plan — and ONE parquet scan — that
  * evaluates the whole broadcast constraint set at once.
  *
  * Scale notes (10^12-doc design):
  *  - Scans are nested-schema-pruned: every check extracts exactly the span
  *    subfields it needs via `spans.field` / `arrays_zip` (the forms
  *    Catalyst pushes into the Parquet ReadSchema) — a kind-only pass reads
  *    one subfield of the struct, not four.
  *  - Subject-local checks (datatype, domain, cardinality, some/only) are
  *    single-scan and shuffle-free: all restrictions evaluate row-locally
  *    into an array of violation structs, exploded once. The reference's
  *    `group by ?s having count(...)` (CheckOwlRestrictionMax.php:153-164)
  *    degenerates to `size(filter(spans.kind, ...))` because the grouping
  *    key is the row key. The domain check needs NO join at all — the
  *    allowed (kind → classes) table is driver-known and compiles into the
  *    predicate.
  *  - Vocabulary checks (defined kinds/classes) shuffle only the distinct
  *    kind/class strings — bytes, not documents.
  *  - Referential checks (URI existence, object range) deduplicate the
  *    probe side FIRST (distinct media_ref), then anti/left join against
  *    the doc_id universe — the one genuinely big join; AQE skew handling
  *    + the pre-dedup keep hot media_ref keys (the skew knob) balanced.
  *  - All schema-side joins are `broadcast(...)`: the ontology is KBs.
  */
final case class CheckContext(
    spark: SparkSession,
    docs: DataFrame,
    schema: SchemaDef
) {
  import spark.implicits._

  /** Array of one span subfield — `spans.kind` etc. Catalyst prunes the
    * Parquet ReadSchema to exactly this subfield.
    */
  def field(name: String): Column = col(s"spans.$name")

  /** Array of (f1, f2, ...) structs zipped from span subfields — also
    * nested-pruning-friendly (unlike a lambda that rebuilds the struct).
    */
  def zipped(fields: String*): Column =
    arrays_zip(fields.map(f => col(s"spans.$f")): _*)

  /** Row-local class-of-document (the `?s a ?class` span); reads only
    * spans.kind + spans.text.
    */
  val clsCol: Column = element_at(
    transform(filter(zipped("kind", "text"),
      p => p.getField("kind") === SchemaDef.TypeKind),
      p => p.getField("text")), 1)

  lazy val kindsDf: DataFrame =
    schema.kinds.map(k => (k.kind, k.kindType, k.range)).toDF("kind", "kindType", "range")

  lazy val classesDf: DataFrame = schema.classes.toDF("cls")

  /** (kind, allowed target class) pairs for object kinds with a declared
    * range — range's subclass closure, precomputed on the driver
    * (reference: reasoner getSubClasses, CheckOwlRestrictionMax.php:683-707).
    */
  lazy val allowedRangePairs: DataFrame = schema.kinds
    .filter(k => k.kindType == "object" && k.range != null)
    .flatMap(k => schema.subClosure.getOrElse(k.range, Set(k.range)).map(c => (k.kind, c)))
    .toDF("kind", "valueCls")

  /** Distinct (kind, media_ref) pairs over ALL reference spans — the shared
    * probe base of the referential checks. URI-existence and object-range
    * both derive from this exact subplan (filtering by kind AFTER the
    * distinct, which is semantics-equal), so at execution time Spark's
    * ReuseExchange materializes the scan+explode+distinct shuffle ONCE.
    */
  lazy val distinctRefs: DataFrame = {
    val refSpans = filter(zipped("kind", "media_ref"),
      p => p.getField("media_ref").isNotNull)
    docs.select(explode(refSpans).as("r"))
      .select(col("r.kind").as("kind"), col("r.media_ref").as("media_ref"))
      .distinct()
  }

  /** Lexical validator for a datatype URI, facet-aware. */
  def validatorFor(dt: String): Column => Column =
    schema.facets.find(_.datatype == dt) match {
      case Some(f) => XsdValidators.facet(f)
      case None    => XsdValidators.forDatatype(dt)
    }

  def violation(checkId: String, severity: String, docId: Column, kind: Column,
                value: Column, expected: Column): Seq[Column] = Seq(
    lit(checkId).as("checkId"), lit(severity).as("severity"),
    docId.cast("string").as("docId"), kind.cast("string").as("kind"),
    value.cast("string").as("value"), expected.cast("string").as("expected"))

  /** Explode a row-local array of violation structs
    * (checkId, kind, value, expected) into standard violation rows —
    * the shared tail of every single-scan subject-local check.
    */
  def explodeViolations(violArray: Column): DataFrame =
    docs.select(col("doc_id"), explode(violArray).as("v"))
      .select(violation(null, "error", col("doc_id"), col("v.kind"),
        col("v.value"), col("v.expected")).patch(0,
        Seq(col("v.checkId").as("checkId")), 1): _*)

  /** A violation struct literal for the row-local array pattern. */
  def vStruct(checkId: String, kind: Column, value: Column, expected: Column): Column =
    struct(lit(checkId).as("checkId"), kind.cast("string").as("kind"),
      value.cast("string").as("value"), expected.cast("string").as("expected"))

  /** Empty violations frame (schema only). */
  def emptyViolations: DataFrame =
    docs.limit(0).select(violation("NONE", "error",
      lit(null), lit(null), lit(null), lit(null)): _*)

  /** Typed empty violation-struct array. */
  def emptyVArray: Column = array().cast(CheckContext.VArrayType)
}

object CheckContext {
  val VArrayType =
    "array<struct<checkId:string,kind:string,value:string,expected:string>>"
}

sealed trait ConstraintCheck {
  def id: String
  def run(ctx: CheckContext): DataFrame
}

/** A check whose error path is a row-local violation-struct array. Such
  * checks are FUSABLE: [[graft.engine.Pipeline.violations]] concatenates the
  * arrays of all row-local checks into one projection and explodes once —
  * all subject-local validation in a single scan of the table.
  */
trait RowLocalCheck extends ConstraintCheck {
  /** `array<struct<checkId,kind,value,expected>>` of this row's violations. */
  def violArray(ctx: CheckContext): Column
  /** Non-row-local extras (warning passes etc.); default none. */
  def extraFrames(ctx: CheckContext): Seq[DataFrame] = Nil
  final def run(ctx: CheckContext): DataFrame = {
    val base = ctx.explodeViolations(violArray(ctx))
    extraFrames(ctx).foldLeft(base)(_ unionByName _)
  }
}

/** Undefined-kind check (CheckPropertiesDefined.php:41-84):
  * distinct used kinds ▷ anti-join the kind dictionary. Reads spans.kind
  * only; shuffles distinct kind strings only.
  */
object CheckKindsDefined extends ConstraintCheck {
  val id = "PROPERTIES-DEFINED"
  def run(ctx: CheckContext): DataFrame = {
    ctx.docs.select(explode(ctx.field("kind")).as("kind"))
      .filter(col("kind") =!= SchemaDef.TypeKind)
      .distinct()
      .join(broadcast(ctx.kindsDf.select("kind")), Seq("kind"), "left_anti")
      .select(ctx.violation(s"$id-100", "error", lit(null), col("kind"),
        lit(null), lit("kind defined in schema")): _*)
  }
}

/** Undefined-class check (CheckClassesDefined.php:41-84). Type spans are
  * filtered row-locally BEFORE the explode, so the Generate sees one row
  * per doc, not one per span.
  */
object CheckClassesDefined extends ConstraintCheck {
  val id = "CLASSES-DEFINED"
  def run(ctx: CheckContext): DataFrame = {
    val typeClasses = transform(
      filter(ctx.zipped("kind", "text"), p => p.getField("kind") === SchemaDef.TypeKind),
      p => p.getField("text"))
    ctx.docs.select(explode(typeClasses).as("cls"))
      .distinct()
      .join(broadcast(ctx.classesDf), Seq("cls"), "left_anti")
      .select(ctx.violation(s"$id-100", "error", lit(null), lit(SchemaDef.TypeKind),
        col("cls"), lit("class defined in schema")): _*)
  }
}

/** Referential-existence check (CheckURIExistence.php:43-96): distinct
  * referenced URIs (minus the excluded-predicate list, :50) that match no
  * doc_id. Probe side is filtered row-locally pre-explode and deduplicated
  * before the anti-join, so hot keys hit the join once per kind.
  */
object CheckUriExistence extends ConstraintCheck {
  val id = "URI-EXISTENCE"
  def run(ctx: CheckContext): DataFrame = {
    val refs = ctx.distinctRefs
      .filter(!col("kind").isin(SchemaDef.UriExistenceExcludedKinds: _*))
    val universe = ctx.docs.select(col("doc_id").as("media_ref"))
    refs.join(universe, Seq("media_ref"), "left_anti")
      .select(ctx.violation(s"$id-100", "error", lit(null), col("kind"),
        col("media_ref"), lit("referenced URI exists")): _*)
  }
}

/** Object-property range check (CheckObjectPropertiesRange.php): the class
  * of each referenced doc must fall in the subclass closure of the kind's
  * declared range; untyped targets count as owl:Thing (:190-194). Kinds
  * used without a declared range yield the warning series (:103-107).
  */
object CheckObjectRange extends ConstraintCheck {
  val id = "OBJECT-PROPERTIES-RANGE"
  def run(ctx: CheckContext): DataFrame = {
    val objKinds = ctx.schema.kinds.filter(_.kindType == "object")
    val withRange = objKinds.filter(_.range != null).map(_.kind)
    val noRange = objKinds.filter(_.range == null).map(_.kind)

    // distinct (kind, target) pairs — shares the materialized distinct-refs
    // exchange with the URI-existence check (see CheckContext.distinctRefs)
    val targets = ctx.distinctRefs.filter(col("kind").isin(withRange: _*))

    val targetCls = ctx.docs.select(
      col("doc_id").as("media_ref"), ctx.clsCol.as("valueCls"))

    val typed = targets.join(targetCls, Seq("media_ref"), "left")
      .withColumn("valueCls", coalesce(col("valueCls"), lit(SchemaDef.OWL_THING)))

    val bad = typed.join(broadcast(ctx.allowedRangePairs), Seq("kind", "valueCls"), "left_anti")
      .select(ctx.violation(s"$id-100", "error", lit(null), col("kind"),
        col("media_ref"), col("valueCls")): _*)

    val warn =
      if (noRange.isEmpty) ctx.emptyViolations
      else ctx.docs
        .select(explode(ctx.field("kind")).as("kind"))
        .filter(col("kind").isin(noRange: _*))
        .distinct()
        .select(ctx.violation(s"$id-51", "warning", lit(null), col("kind"),
          lit(null), lit("kind has a declared range")): _*)

    bad.unionByName(warn)
  }
}

/** Domain check (CheckObjectDatatypePropertiesDomain.php): the subject's
  * class must fall in the closure of one of the kind's domains. JOIN-FREE:
  * subject class and used kinds live in the same row, and the allowed
  * (kind → classes) table is driver-known, so the whole check compiles into
  * a row-local predicate. The reference needed a subject-types subquery per
  * property (:137-143).
  */
object CheckDomain extends RowLocalCheck {
  val id = "OBJECT-DATATYPE-PROPERTIES-DOMAIN"
  def violArray(ctx: CheckContext): Column = {
    val domainKinds = ctx.schema.kinds.filter(_.domain.nonEmpty)
    if (domainKinds.isEmpty) return ctx.emptyVArray
    val cls = coalesce(ctx.clsCol, lit(SchemaDef.OWL_THING))
    def allowed(k: KindDef): Seq[String] =
      k.domain.flatMap(d => ctx.schema.subClosure.getOrElse(d, Set(d))).distinct
    // row-local: distinct used domain-kinds whose (kind, cls) is not allowed
    val badKinds = filter(
      array_distinct(filter(ctx.field("kind"),
        k => k.isin(domainKinds.map(_.kind): _*))),
      k => !domainKinds.map(kd =>
        k === kd.kind && cls.isin(allowed(kd): _*)).reduce(_ || _))
    transform(badKinds, k =>
      ctx.vStruct(s"$id-100", k, cls, lit("subject class in kind's domain")))
  }
}

/** Datatype-conformance check (CheckDatatypePropertiesDatatype.php): every
  * text value of a datatype kind must be lexically valid for the kind's
  * declared range datatype (facet-aware for custom datatypes). Single scan,
  * shuffle-free error path: offending spans are filtered row-locally
  * pre-explode with one CASE dispatch per kind. Kinds used without a
  * declared range → warning series (:110).
  */
object CheckDatatype extends RowLocalCheck {
  val id = "DATATYPE-PROPERTIES-DATATYPE"
  def violArray(ctx: CheckContext): Column = {
    val dtKinds = ctx.schema.kinds.filter(k => k.kindType == "datatype" && k.range != null)
    if (dtKinds.isEmpty) return ctx.emptyVArray

    def validOf(kind: Column, text: Column): Column =
      dtKinds.foldLeft(lit(true)) { (acc, k) =>
        when(kind === k.kind, ctx.validatorFor(k.range)(text)).otherwise(acc)
      }
    def expectedOf(kind: Column): Column =
      dtKinds.foldLeft(lit(null).cast("string")) { (acc, k) =>
        when(kind === k.kind, lit(k.range)).otherwise(acc)
      }

    val badSpans = filter(ctx.zipped("kind", "text"), p =>
      p.getField("kind").isin(dtKinds.map(_.kind): _*) &&
        p.getField("text").isNotNull &&
        !coalesce(validOf(p.getField("kind"), p.getField("text")), lit(false)))
    transform(badSpans, p =>
      ctx.vStruct(s"$id-100", p.getField("kind"), p.getField("text"),
        expectedOf(p.getField("kind"))))
  }

  override def extraFrames(ctx: CheckContext): Seq[DataFrame] = {
    val noRange = ctx.schema.kinds.filter(k => k.kindType == "datatype" && k.range == null).map(_.kind)
    if (noRange.isEmpty) Nil
    else Seq(ctx.docs.select(explode(ctx.field("kind")).as("kind"))
      .filter(col("kind").isin(noRange: _*))
      .distinct()
      .select(ctx.violation(s"$id-51", "warning", lit(null), col("kind"),
        lit(null), lit("kind has a declared range datatype")): _*))
  }
}

/** Cardinality restrictions (CheckOwlRestriction{Max,Min,Exact}.php): the
  * reference's `group by ?s ?onProperty having count(...)` is re-expressed
  * shuffle-free as `size(filter(spans.kind, == p))` — the grouping key is
  * the row key — and ALL restrictions evaluate in ONE scan via the
  * violation-array pattern. Includes the zero-occurrence edge cases the
  * reference handles with separate `filter not exists` queries
  * (CheckOwlRestrictionMin.php:211-223, Exact:208-220).
  */
object CheckCardinality extends RowLocalCheck {
  val id = "OWL-RESTRICTION-CARD"

  /** Data-range (and unqualified) restrictions evaluate row-locally: spans
    * carry no datatype annotations in our model (the expected datatype is
    * schema-side), so datatype-qualified counts equal unqualified counts —
    * documented deviation from the reference's `datatype(?value)` filter
    * (CheckOwlRestrictionMax.php:122-150).
    */
  def violArray(ctx: CheckContext): Column = {
    val rs = ctx.schema.restrictions.filter(r =>
      Set("min", "max", "exact").contains(r.rtype) && r.classExpr == null)
    if (rs.isEmpty) return ctx.emptyVArray
    cardStructs(ctx, rs, cntOf = r => size(filter(ctx.field("kind"), k => k === r.onProperty)))
  }

  private def cardStructs(ctx: CheckContext, rs: Seq[RestrictionDef],
                          cntOf: RestrictionDef => Column): Column = {
    val cls = ctx.clsCol
    val structs = rs.flatMap { r =>
      val applicable = ctx.schema.subClosure.getOrElse(r.onClass, Set(r.onClass)).toSeq
      val cnt = cntOf(r)
      val app = cls.isin(applicable: _*)
      r.rtype match {
        case "max" => Seq(
          when(app && cnt > r.n, ctx.vStruct("OWL-RESTRICTION-MAX-100",
            lit(r.onProperty), cnt, lit(s"at most ${r.n} ${r.onProperty}"))))
        case "min" => Seq(
          when(app && cnt > 0 && cnt < r.n, ctx.vStruct("OWL-RESTRICTION-MIN-100",
            lit(r.onProperty), cnt, lit(s"at least ${r.n} ${r.onProperty}"))),
          when(app && cnt === 0, ctx.vStruct("OWL-RESTRICTION-MIN-102",
            lit(r.onProperty), cnt, lit(s"at least ${r.n} ${r.onProperty}"))))
        case "exact" => Seq(
          when(app && cnt > 0 && cnt =!= r.n, ctx.vStruct("OWL-RESTRICTION-EXACT-100",
            lit(r.onProperty), cnt, lit(s"exactly ${r.n} ${r.onProperty}"))),
          when(app && cnt === 0 && r.n != 0, ctx.vStruct("OWL-RESTRICTION-EXACT-102",
            lit(r.onProperty), cnt, lit(s"exactly ${r.n} ${r.onProperty}"))))
      }
    }
    filter(array(structs: _*), v => v.isNotNull)
  }

  /** Qualified object restrictions (owl:onClass, e.g.
    * CheckOwlRestrictionMax.php:705-735): only values whose TARGET's class
    * falls in the qualifying-class closure count. This genuinely needs the
    * ref → target-class join, so it runs as an extra frame: refs of the
    * restricted kinds join the (deduplicated) target-class table, counts
    * roll up per doc, and docs of the restricted class with zero qualifying
    * values are recovered with a left join.
    */
  override def extraFrames(ctx: CheckContext): Seq[DataFrame] = {
    val rs = ctx.schema.restrictions.filter(r =>
      Set("min", "max", "exact").contains(r.rtype) && r.classExpr != null)
    if (rs.isEmpty) return Nil
    val cls = ctx.clsCol
    val kinds = rs.map(_.onProperty).distinct

    val refSpans = filter(ctx.zipped("kind", "media_ref"), p =>
      p.getField("media_ref").isNotNull && p.getField("kind").isin(kinds: _*))
    val refs = ctx.docs.select(col("doc_id"), explode(refSpans).as("r"))
      .select(col("doc_id"), col("r.kind").as("kind"), col("r.media_ref").as("media_ref"))
    val targetCls = ctx.docs.select(
      col("doc_id").as("media_ref"), cls.as("targetCls"))
    val typed = refs.join(targetCls, Seq("media_ref"), "left")
      .withColumn("targetCls", coalesce(col("targetCls"), lit(SchemaDef.OWL_THING)))

    val frames = rs.map { r =>
      val applicable = ctx.schema.subClosure.getOrElse(r.onClass, Set(r.onClass)).toSeq
      val qualifying = ctx.schema.subClosure.getOrElse(r.classExpr, Set(r.classExpr)).toSeq
      val counts = typed.filter(col("kind") === r.onProperty)
        .groupBy("doc_id")
        .agg(count(when(col("targetCls").isin(qualifying: _*), 1)).as("cnt"))
      val base = ctx.docs.filter(cls.isin(applicable: _*)).select("doc_id")
        .join(counts, Seq("doc_id"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      val viol = r.rtype match {
        case "max" => base.filter(col("cnt") > r.n)
          .withColumn("cid", lit("OWL-RESTRICTION-MAX-100"))
        case "min" => base.filter(col("cnt") < r.n)
          .withColumn("cid", when(col("cnt") === 0, "OWL-RESTRICTION-MIN-102")
            .otherwise("OWL-RESTRICTION-MIN-100"))
        case "exact" => base.filter(col("cnt") =!= r.n)
          .withColumn("cid", when(col("cnt") === 0, "OWL-RESTRICTION-EXACT-102")
            .otherwise("OWL-RESTRICTION-EXACT-100"))
      }
      viol.select(ctx.violation(null, "error", col("doc_id"), lit(r.onProperty),
        col("cnt"), lit(s"${r.rtype} ${r.n} ${r.onProperty} of class ${r.classExpr}"))
        .patch(0, Seq(col("cid").as("checkId")), 1): _*)
    }
    Seq(frames.reduce(_ unionByName _))
  }
}

/** Existential restriction (CheckOwlRestrictionSome.php): each instance of
  * the restricted class needs at least one value of the property that is
  * lexically valid for the data range (:150-162, :252-522). Single scan;
  * `exists(...)` short-circuits like the reference's early-exit loop
  * (:504-509).
  */
object CheckSome extends RowLocalCheck {
  val id = "OWL-RESTRICTION-SOME"
  def violArray(ctx: CheckContext): Column = {
    val rs = ctx.schema.restrictions.filter(r => r.rtype == "some" && r.dataRange != null)
    if (rs.isEmpty) return ctx.emptyVArray
    val cls = ctx.clsCol
    val structs = rs.flatMap { r =>
      val applicable = ctx.schema.subClosure.getOrElse(r.onClass, Set(r.onClass)).toSeq
      val valid = ctx.validatorFor(r.dataRange)
      val app = cls.isin(applicable: _*)
      val nProp = size(filter(ctx.field("kind"), k => k === r.onProperty))
      val anyValid = exists(
        filter(ctx.zipped("kind", "text"), p => p.getField("kind") === r.onProperty),
        p => coalesce(valid(p.getField("text")), lit(false)))
      Seq(
        when(app && nProp === 0, ctx.vStruct(s"$id-100", lit(r.onProperty),
          lit(null), lit(s"some ${r.dataRange} value for ${r.onProperty}"))),
        when(app && nProp > 0 && !anyValid, ctx.vStruct(s"$id-102", lit(r.onProperty),
          lit(null), lit(s"some valid ${r.dataRange} value for ${r.onProperty}"))))
    }
    filter(array(structs: _*), v => v.isNotNull)
  }
}

/** Universal restriction (CheckOwlRestrictionOnly.php:119-163): ANY value of
  * the property lexically invalid for the data range is a violation.
  * Single scan; offending values collected row-locally.
  */
object CheckOnly extends RowLocalCheck {
  val id = "OWL-RESTRICTION-ONLY"
  def violArray(ctx: CheckContext): Column = {
    val rs = ctx.schema.restrictions.filter(r => r.rtype == "only" && r.dataRange != null)
    if (rs.isEmpty) return ctx.emptyVArray
    val cls = ctx.clsCol
    val perR = rs.map { r =>
      val applicable = ctx.schema.subClosure.getOrElse(r.onClass, Set(r.onClass)).toSeq
      val valid = ctx.validatorFor(r.dataRange)
      val offending = filter(ctx.zipped("kind", "text"), p =>
        p.getField("kind") === r.onProperty &&
          !coalesce(valid(p.getField("text")), lit(false)))
      when(cls.isin(applicable: _*),
        transform(offending, p => ctx.vStruct(s"$id-100", p.getField("kind"),
          p.getField("text"), lit(r.dataRange))))
        .otherwise(ctx.emptyVArray)
    }
    flatten(array(perR: _*))
  }
}

/** Field-type presence check (CheckFieldTypeDefined.php:56-94, NOT in the
  * reference's default pipeline, SURVEY.md §2.8): datatype kinds used in the
  * data whose schema definition carries no fieldType.
  */
object CheckFieldTypeDefined extends ConstraintCheck {
  val id = "FIELD-TYPE-DEFINED"
  def run(ctx: CheckContext): DataFrame = {
    import ctx.spark.implicits._
    val missing = ctx.schema.kinds
      .filter(k => k.kindType == "datatype" && k.fieldType == null).map(_.kind)
    if (missing.isEmpty) return ctx.emptyViolations
    ctx.docs.select(explode(ctx.field("kind")).as("kind"))
      .filter(col("kind").isin(missing: _*))
      .distinct()
      .select(ctx.violation(s"$id-100", "error", lit(null), col("kind"),
        lit(null), lit("kind has a declared fieldType")): _*)
  }
}

/** doc_id uniqueness (north star: "salted-key uniqueness"): duplicate
  * primary keys across the corpus, detected with two-phase salted
  * aggregation so one hot doc_id can't overload a reducer. The reference has
  * no analogue (Virtuoso enforces graph-level uniqueness); this is an
  * engine-native table-integrity check.
  */
object CheckDocIdUnique extends ConstraintCheck {
  val id = "DOC-ID-UNIQUE"
  def run(ctx: CheckContext): DataFrame = {
    graft.engine.Skew.duplicateKeys(ctx.docs.select("doc_id"), "doc_id")
      .select(ctx.violation(s"$id-100", "error", col("doc_id"), lit(null),
        col("key_count"), lit("doc_id occurs once")): _*)
  }
}

object Checks {
  /** Default pipeline, mirroring dvt.ini:21-33's check list
    * (CheckFieldTypeDefined exists but is not in the default list, matching
    * the reference).
    */
  val all: Seq[ConstraintCheck] = Seq(
    CheckKindsDefined, CheckClassesDefined, CheckUriExistence,
    CheckObjectRange, CheckDomain, CheckDatatype,
    CheckCardinality, CheckSome, CheckOnly)
}
