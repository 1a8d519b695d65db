package graft.model

/** Constraint schema — the Spark-native stand-in for the reference's
  * runtime-loaded ontology graphs (dvt.ini:10-18; queried per check, e.g.
  * CheckClassesDefined.php:35-38). The ontology is tiny relative to the data,
  * so the whole schema is driver-resident and broadcast into every check:
  * joins against it are broadcast joins, never shuffles.
  */

/** A property ("kind") definition. kindType mirrors
  * owl:ObjectProperty / owl:DatatypeProperty (CheckObjectPropertiesRange.php:49,
  * CheckDatatypePropertiesDatatype.php:55).
  * - `domain`: allowed subject classes (rdfs:domain; multi-domain = OR,
  *   CheckObjectDatatypePropertiesDomain.php:243-250). Empty = unconstrained.
  * - `range`: for object kinds a class URI, for datatype kinds a datatype URI
  *   (rdfs:range, CheckObjectPropertiesRange.php:58-61). null = undeclared
  *   (reference emits the `*-50` warning series for that).
  */
final case class KindDef(
    kind: String,
    kindType: String, // "object" | "datatype"
    domain: Seq[String],
    range: String,
    fieldType: String = null // CheckFieldTypeDefined analogue (drupal:fieldType)
)

/** owl:Restriction analogue (CheckOwlRestriction{Max,Min,Exact,Some,Only}.php).
  * `rtype` in {min, max, exact, some, only}; `n` = cardinality (ignored for
  * some/only); exactly one of `dataRange` (expected datatype URI) or
  * `classExpr` (expected class URI) is set, mirroring the qualified
  * datatype/object split in the reference (e.g. CheckOwlRestrictionMax.php:56
  * vs :611).
  */
final case class RestrictionDef(
    onClass: String,
    onProperty: String,
    rtype: String,
    n: Int,
    dataRange: String,
    classExpr: String
)

/** XSP facet-constrained custom datatype (Check.php:559-953): optional base
  * datatype + pattern + numeric bounds + length facets. Our semantics are a
  * CONJUNCTION of all declared facets; the reference returns on the first
  * facet evaluated (Check.php:849-911) and its `length` facet compares against
  * the `maxLength` key (Check.php:940-944) — both documented deviations, we
  * implement the evidently-intended semantics.
  */
final case class FacetDef(
    datatype: String,
    base: String,
    pattern: String,
    minInclusive: java.math.BigDecimal,
    maxInclusive: java.math.BigDecimal,
    minExclusive: java.math.BigDecimal,
    maxExclusive: java.math.BigDecimal,
    minLength: Integer,
    maxLength: Integer,
    length: Integer
)

object FacetDef {
  def apply(datatype: String, base: String = null, pattern: String = null,
            minInclusive: String = null, maxInclusive: String = null,
            minExclusive: String = null, maxExclusive: String = null,
            minLength: Integer = null, maxLength: Integer = null,
            length: Integer = null): FacetDef = {
    def dec(s: String) = if (s == null) null else new java.math.BigDecimal(s)
    new FacetDef(datatype, base, pattern, dec(minInclusive), dec(maxInclusive),
      dec(minExclusive), dec(maxExclusive), minLength, maxLength, length)
  }
}

/** The full constraint set a validation run executes against — the engine's
  * equivalent of the reference's dvt.ini ontologies + check parameters.
  *
  * All members are small (ontologies are KBs while data is TBs); the engine
  * broadcasts Datasets derived from them.
  */
final case class SchemaDef(
    kinds: Seq[KindDef],
    classes: Seq[String],
    subClassOf: Seq[(String, String)], // (child, parent) edges, DAG
    restrictions: Seq[RestrictionDef],
    facets: Seq[FacetDef]
) {

  /** Reflexive-transitive superclass closure, computed on the driver
    * (reference: reasoner-backed getSuperClasses(all),
    * CheckObjectPropertiesRange.php:213-244). BFS over the edge list —
    * the ontology is orders of magnitude smaller than the data, so no
    * distributed transitive closure is warranted.
    */
  lazy val superClosure: Map[String, Set[String]] = {
    val parents: Map[String, Seq[String]] =
      subClassOf.groupBy(_._1).map { case (c, es) => c -> es.map(_._2) }
    val all = (classes ++ subClassOf.flatMap(e => Seq(e._1, e._2))).distinct
    all.map { c =>
      var seen = Set(c)
      var frontier = Set(c)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(f => parents.getOrElse(f, Nil)) -- seen
        seen ++= next
        frontier = next
      }
      c -> seen
    }.toMap
  }

  /** Reflexive-transitive subclass closure (reference: getSubClasses(all),
    * CheckOwlRestrictionMax.php:683-707).
    */
  lazy val subClosure: Map[String, Set[String]] = {
    val all = (classes ++ subClassOf.flatMap(e => Seq(e._1, e._2))).distinct
    val down = all.map(c => c -> Set(c)).toMap
    superClosure.foldLeft(down) { case (acc, (child, sups)) =>
      sups.foldLeft(acc)((a, sup) => a.updated(sup, a.getOrElse(sup, Set()) + child))
    }
  }

  lazy val kindByName: Map[String, KindDef] = kinds.map(k => k.kind -> k).toMap

  /** Is `dt` a facet-defined custom datatype of this schema? */
  def isCustomDatatype(dt: String): Boolean = facets.exists(_.datatype == dt)

  /** Asserted datatypes accepted by a datatype-qualified restriction count,
    * verbatim re-expression of the reference's `datatype(?value)` filter
    * (CheckOwlRestrictionMax.php:122-150; Min/Exact identical):
    *  - rdfs:Literal → {rdfs:Literal, xsd:string} (Virtuoso default-type);
    *  - custom datatype with base xsd:anySimpleType → {dt, base, xsd:string};
    *  - custom datatype with another base → {dt, base};
    *  - plain datatype → {dt} exactly.
    * Unannotated spans compare as xsd:string (SPARQL `datatype()` of a plain
    * literal under Virtuoso). Returns null when the restriction has no
    * dataRange (unqualified count).
    */
  def qualifiedDtAccept(dataRange: String): Set[String] =
    if (dataRange == null) null
    else if (dataRange == SchemaDef.RDFS + "Literal")
      Set(dataRange, SchemaDef.XSD + "string")
    else facets.find(_.datatype == dataRange) match {
      case Some(f) if f.base == SchemaDef.XSD + "anySimpleType" =>
        Set(dataRange, f.base, SchemaDef.XSD + "string")
      case Some(f) if f.base != null => Set(dataRange, f.base)
      case _ => Set(dataRange)
    }

  /** Stable hash of the constraint set, recorded in verdict/lineage rows so a
    * resume only reuses partitions validated under the identical schema.
    */
  lazy val constraintHash: String = {
    val repr = (kinds.map(_.toString).sorted ++ classes.sorted ++
      subClassOf.map(_.toString).sorted ++ restrictions.map(_.toString).sorted ++
      facets.map(_.toString).sorted).mkString("\n")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(repr.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
  }
}

object SchemaDef {

  /** XSD/RDF namespace constants used throughout. */
  val XSD = "http://www.w3.org/2001/XMLSchema#"
  val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
  val OWL_THING = "http://www.w3.org/2002/07/owl#Thing"

  /** The span kind that carries a record's class, mirroring `?s a ?class`. */
  val TypeKind = "type"

  /** Virtuoso's internal datatype coercions, verbatim from
    * CheckDatatypePropertiesDatatype.php:204-213: declared range → asserted
    * datatypes whose mismatch is muted in strict mode ("false positives" —
    * Virtuoso rewrites equivalent literals to these types internally).
    */
  val VirtuosoCoercions: Map[String, Set[String]] = Map(
    XSD + "boolean" -> Set(XSD + "integer"),
    XSD + "unsignedByte" -> Set(XSD + "integer"),
    XSD + "nonPositiveInteger" -> Set(XSD + "integer"),
    XSD + "positiveInteger" -> Set(XSD + "integer"),
    XSD + "negativeInteger" -> Set(XSD + "integer"),
    XSD + "unsignedLong" -> Set(XSD + "integer", XSD + "decimal"),
    XSD + "nonNegativeInteger" -> Set(XSD + "integer"),
    XSD + "unsignedShort" -> Set(XSD + "integer")
  )

  /** Kinds excluded from the referential-existence check, verbatim from
    * CheckURIExistence.php:50.
    */
  val UriExistenceExcludedKinds: Seq[String] = Seq(
    RDF + "value",
    "http://purl.org/dc/terms/isPartOf",
    RDFS + "isDefinedBy"
  )

  /** Kinds the domain check never enumerates (rdf:type is the TypeKind,
    * handled separately), verbatim from
    * CheckObjectDatatypePropertiesDomain.php:61.
    */
  val DomainExcludedKinds: Seq[String] = Seq(
    "http://purl.org/dc/terms/isPartOf",
    RDF + "value"
  )
}
