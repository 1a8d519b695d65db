package graft.checks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.validators.XsdValidators

/** The reference's check inventory (SURVEY.md §2.8) re-expressed as Spark
  * plans over the `documents` table. Key inversion vs the reference: where
  * the PHP orchestrator issued one-to-three SPARQL queries *per property or
  * restriction* (classic N+1, e.g. CheckObjectPropertiesRange.php:118-313),
  * every check here is ONE declarative plan that joins the data once against
  * the broadcast constraint set.
  *
  * Scale notes (10^12-doc design):
  *  - Subject-local checks (datatype validity, domain, cardinality,
  *    some/only) are evaluated with higher-order array functions inside the
  *    row — zero shuffles; grouping key == row key, so the reference's
  *    `group by ?s having count(...)` (CheckOwlRestrictionMax.php:153-164)
  *    degenerates to `size(filter(spans, ...))`.
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

  /** Exploded span view (kind, text, media_ref per doc). Column-pruned by
    * Catalyst to just the fields each check touches.
    */
  lazy val sp: DataFrame = docs.select(
    col("doc_id"),
    explode(col("spans")).as("s")
  ).select(col("doc_id"), col("s.kind").as("kind"),
    col("s.text").as("text"), col("s.media_ref").as("media_ref"))

  /** Row-local class-of-document column (the `?s a ?class` span). */
  val clsCol: Column = element_at(
    filter(col("spans"), s => s.getField("kind") === SchemaDef.TypeKind), 1
  ).getField("text")

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

  /** (kind, allowed subject class) pairs — union of subclass closures over
    * the kind's domains (multi-domain = OR,
    * CheckObjectDatatypePropertiesDomain.php:243-250).
    */
  lazy val allowedDomainPairs: DataFrame = schema.kinds
    .filter(_.domain.nonEmpty)
    .flatMap(k => k.domain.flatMap(d => schema.subClosure.getOrElse(d, Set(d))).map(c => (k.kind, c)))
    .toDF("kind", "cls")

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
}

sealed trait ConstraintCheck {
  def id: String
  def run(ctx: CheckContext): DataFrame
}

/** Undefined-kind check (CheckPropertiesDefined.php:41-84):
  * distinct used kinds ▷ anti-join the kind dictionary.
  */
object CheckKindsDefined extends ConstraintCheck {
  val id = "PROPERTIES-DEFINED"
  def run(ctx: CheckContext): DataFrame = {
    ctx.sp.filter(col("kind") =!= SchemaDef.TypeKind)
      .select("kind").distinct()
      .join(broadcast(ctx.kindsDf.select("kind")), Seq("kind"), "left_anti")
      .select(ctx.violation(s"$id-100", "error", lit(null), col("kind"),
        lit(null), lit("kind defined in schema")): _*)
  }
}

/** Undefined-class check (CheckClassesDefined.php:41-84). */
object CheckClassesDefined extends ConstraintCheck {
  val id = "CLASSES-DEFINED"
  def run(ctx: CheckContext): DataFrame = {
    ctx.sp.filter(col("kind") === SchemaDef.TypeKind)
      .select(col("text").as("cls")).distinct()
      .join(broadcast(ctx.classesDf), Seq("cls"), "left_anti")
      .select(ctx.violation(s"$id-100", "error", lit(null), lit(SchemaDef.TypeKind),
        col("cls"), lit("class defined in schema")): _*)
  }
}

/** Referential-existence check (CheckURIExistence.php:43-96): distinct
  * referenced URIs (minus the excluded-predicate list, :50) that match no
  * doc_id. Probe side deduplicated before the anti-join so hot keys hit the
  * join once per kind.
  */
object CheckUriExistence extends ConstraintCheck {
  val id = "URI-EXISTENCE"
  def run(ctx: CheckContext): DataFrame = {
    val refs = ctx.sp
      .filter(col("media_ref").isNotNull &&
        !col("kind").isin(SchemaDef.UriExistenceExcludedKinds: _*))
      .select("media_ref", "kind").distinct()
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
    import ctx.spark.implicits._
    val objKinds = ctx.schema.kinds.filter(_.kindType == "object")
    val withRange = objKinds.filter(_.range != null).map(_.kind)
    val noRange = objKinds.filter(_.range == null).map(_.kind)

    // distinct (kind, target) pairs — dedup before the big join.
    val targets = ctx.sp
      .filter(col("media_ref").isNotNull && col("kind").isin(withRange: _*))
      .select("kind", "media_ref").distinct()

    val targetCls = ctx.docs.select(
      col("doc_id").as("media_ref"), ctx.clsCol.as("valueCls"))

    val typed = targets.join(targetCls, Seq("media_ref"), "left")
      .withColumn("valueCls", coalesce(col("valueCls"), lit(SchemaDef.OWL_THING)))

    val bad = typed.join(broadcast(ctx.allowedRangePairs), Seq("kind", "valueCls"), "left_anti")
      .select(ctx.violation(s"$id-100", "error", lit(null), col("kind"),
        col("media_ref"), col("valueCls")): _*)

    val warn = ctx.sp.filter(col("kind").isin(noRange: _*))
      .select("kind").distinct()
      .select(ctx.violation(s"$id-51", "warning", lit(null), col("kind"),
        lit(null), lit("kind has a declared range")): _*)

    bad.unionByName(warn)
  }
}

/** Domain check (CheckObjectDatatypePropertiesDomain.php): the subject's
  * class must fall in the closure of one of the kind's domains. Subject
  * class and used kinds live in the same row, so this is fully row-local —
  * the reference needed a subject-types subquery per property (:137-143).
  */
object CheckDomain extends ConstraintCheck {
  val id = "OBJECT-DATATYPE-PROPERTIES-DOMAIN"
  def run(ctx: CheckContext): DataFrame = {
    val domainKinds = ctx.schema.kinds.filter(_.domain.nonEmpty).map(_.kind)
    if (domainKinds.isEmpty) return emptyViolations(ctx)
    val perDoc = ctx.docs.select(
      col("doc_id"),
      coalesce(ctx.clsCol, lit(SchemaDef.OWL_THING)).as("cls"),
      array_distinct(transform(
        filter(col("spans"), s => s.getField("kind").isin(domainKinds: _*)),
        s => s.getField("kind"))).as("usedKinds"))
      .filter(size(col("usedKinds")) > 0)
      .select(col("doc_id"), col("cls"), explode(col("usedKinds")).as("kind"))
    perDoc.join(broadcast(ctx.allowedDomainPairs), Seq("kind", "cls"), "left_anti")
      .select(ctx.violation(s"$id-100", "error", col("doc_id"), col("kind"),
        col("cls"), lit("subject class in kind's domain")): _*)
  }
  private def emptyViolations(ctx: CheckContext): DataFrame =
    ctx.docs.limit(0).select(ctx.violation(s"$id-100", "error",
      lit(null), lit(null), lit(null), lit(null)): _*)
}

/** Datatype-conformance check (CheckDatatypePropertiesDatatype.php): every
  * text value of a datatype kind must be lexically valid for the kind's
  * declared range datatype (facet-aware for custom datatypes). One CASE
  * dispatch per kind — fully row-local, zero shuffles for the error path.
  * Kinds used without a declared range → warning series (:110).
  */
object CheckDatatype extends ConstraintCheck {
  val id = "DATATYPE-PROPERTIES-DATATYPE"
  def run(ctx: CheckContext): DataFrame = {
    val dtKinds = ctx.schema.kinds.filter(k => k.kindType == "datatype" && k.range != null)
    val noRange = ctx.schema.kinds.filter(k => k.kindType == "datatype" && k.range == null).map(_.kind)

    val vals = ctx.sp
      .filter(col("kind").isin(dtKinds.map(_.kind): _*) && col("text").isNotNull)

    // CASE WHEN kind = k THEN <validator_k>(text) — built-in exprs only.
    val validCol = dtKinds.foldLeft(lit(true)) { (acc, k) =>
      when(col("kind") === k.kind, ctx.validatorFor(k.range)(col("text"))).otherwise(acc)
    }
    val expectedCol = dtKinds.foldLeft(lit(null).cast("string")) { (acc, k) =>
      when(col("kind") === k.kind, lit(k.range)).otherwise(acc)
    }

    val bad = vals.withColumn("valid", validCol)
      .filter(!col("valid"))
      .select(ctx.violation(s"$id-100", "error", col("doc_id"), col("kind"),
        col("text"), expectedCol): _*)

    val warn = ctx.sp.filter(col("kind").isin(noRange: _*))
      .select("kind").distinct()
      .select(ctx.violation(s"$id-51", "warning", lit(null), col("kind"),
        lit(null), lit("kind has a declared range datatype")): _*)

    bad.unionByName(warn)
  }
}

/** Cardinality restrictions (CheckOwlRestriction{Max,Min,Exact}.php): the
  * reference's `group by ?s ?onProperty having count(...)` is re-expressed
  * shuffle-free as `size(filter(spans, kind == p))` — the grouping key is
  * the row key. Includes the zero-occurrence edge cases the reference
  * handles with separate `filter not exists` queries
  * (CheckOwlRestrictionMin.php:211-223, Exact:208-220).
  */
object CheckCardinality extends ConstraintCheck {
  val id = "OWL-RESTRICTION-CARD"
  def run(ctx: CheckContext): DataFrame = {
    val rs = ctx.schema.restrictions.filter(r => Set("min", "max", "exact").contains(r.rtype))
    if (rs.isEmpty) return CheckDomain.run(ctx).limit(0)
    val cls = ctx.clsCol
    val frames = rs.map { r =>
      val applicable = ctx.schema.subClosure.getOrElse(r.onClass, Set(r.onClass)).toSeq
      val cnt = size(filter(col("spans"), s => s.getField("kind") === r.onProperty))
      val base = ctx.docs.filter(cls.isin(applicable: _*)).withColumn("cnt", cnt)
      r.rtype match {
        case "max" =>
          base.filter(col("cnt") > r.n)
            .select(ctx.violation("OWL-RESTRICTION-MAX-100", "error", col("doc_id"),
              lit(r.onProperty), col("cnt"), lit(s"at most ${r.n} ${r.onProperty}")): _*)
        case "min" =>
          val under = base.filter(col("cnt") > 0 && col("cnt") < r.n)
            .select(ctx.violation("OWL-RESTRICTION-MIN-100", "error", col("doc_id"),
              lit(r.onProperty), col("cnt"), lit(s"at least ${r.n} ${r.onProperty}")): _*)
          val zero = base.filter(col("cnt") === 0)
            .select(ctx.violation("OWL-RESTRICTION-MIN-102", "error", col("doc_id"),
              lit(r.onProperty), col("cnt"), lit(s"at least ${r.n} ${r.onProperty}")): _*)
          under.unionByName(zero)
        case "exact" =>
          val wrong = base.filter(col("cnt") > 0 && col("cnt") =!= r.n)
            .select(ctx.violation("OWL-RESTRICTION-EXACT-100", "error", col("doc_id"),
              lit(r.onProperty), col("cnt"), lit(s"exactly ${r.n} ${r.onProperty}")): _*)
          val zero = if (r.n == 0) wrong.limit(0) else base.filter(col("cnt") === 0)
            .select(ctx.violation("OWL-RESTRICTION-EXACT-102", "error", col("doc_id"),
              lit(r.onProperty), col("cnt"), lit(s"exactly ${r.n} ${r.onProperty}")): _*)
          wrong.unionByName(zero)
      }
    }
    frames.reduce(_ unionByName _)
  }
}

/** Existential restriction (CheckOwlRestrictionSome.php): each instance of
  * the restricted class needs at least one value of the property that is
  * lexically valid for the data range (:150-162, :252-522). Row-local via
  * `exists(spans, ...)` — short-circuits like the reference's early-exit
  * loop (:504-509).
  */
object CheckSome extends ConstraintCheck {
  val id = "OWL-RESTRICTION-SOME"
  def run(ctx: CheckContext): DataFrame = {
    val rs = ctx.schema.restrictions.filter(r => r.rtype == "some" && r.dataRange != null)
    if (rs.isEmpty) return CheckDomain.run(ctx).limit(0)
    val cls = ctx.clsCol
    rs.map { r =>
      val applicable = ctx.schema.subClosure.getOrElse(r.onClass, Set(r.onClass)).toSeq
      val valid = ctx.validatorFor(r.dataRange)
      val propSpans = filter(col("spans"), s => s.getField("kind") === r.onProperty)
      val anyValid = exists(propSpans,
        s => coalesce(valid(s.getField("text")), lit(false)))
      val base = ctx.docs.filter(cls.isin(applicable: _*))
        .withColumn("nProp", size(propSpans)).withColumn("anyValid", anyValid)
      val none = base.filter(col("nProp") === 0)
        .select(ctx.violation(s"$id-100", "error", col("doc_id"), lit(r.onProperty),
          lit(null), lit(s"some ${r.dataRange} value for ${r.onProperty}")): _*)
      val noneValid = base.filter(col("nProp") > 0 && !col("anyValid"))
        .select(ctx.violation(s"$id-102", "error", col("doc_id"), lit(r.onProperty),
          lit(null), lit(s"some valid ${r.dataRange} value for ${r.onProperty}")): _*)
      none.unionByName(noneValid)
    }.reduce(_ unionByName _)
  }
}

/** Universal restriction (CheckOwlRestrictionOnly.php:119-163): ANY value of
  * the property lexically invalid for the data range is a violation.
  * Row-local explode + validate.
  */
object CheckOnly extends ConstraintCheck {
  val id = "OWL-RESTRICTION-ONLY"
  def run(ctx: CheckContext): DataFrame = {
    val rs = ctx.schema.restrictions.filter(r => r.rtype == "only" && r.dataRange != null)
    if (rs.isEmpty) return CheckDomain.run(ctx).limit(0)
    val cls = ctx.clsCol
    rs.map { r =>
      val applicable = ctx.schema.subClosure.getOrElse(r.onClass, Set(r.onClass)).toSeq
      val valid = ctx.validatorFor(r.dataRange)
      ctx.docs.filter(cls.isin(applicable: _*))
        .select(col("doc_id"),
          explode(filter(col("spans"), s => s.getField("kind") === r.onProperty)).as("s"))
        .filter(!coalesce(valid(col("s.text")), lit(false)))
        .select(ctx.violation(s"$id-100", "error", col("doc_id"), lit(r.onProperty),
          col("s.text"), lit(r.dataRange)): _*)
    }.reduce(_ unionByName _)
  }
}

object Checks {
  /** Default pipeline, mirroring dvt.ini:21-33's check list. */
  val all: Seq[ConstraintCheck] = Seq(
    CheckKindsDefined, CheckClassesDefined, CheckUriExistence,
    CheckObjectRange, CheckDomain, CheckDatatype,
    CheckCardinality, CheckSome, CheckOnly)
}
