package graft.model

/** Core data model of the graft validation engine.
  *
  * Input-table shape is fixed by the engine contract (BASELINE.json `input_hint`):
  * `documents(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)`.
  * A span plays the role of one RDF triple in the reference
  * (reference: every check queries `graph ?g { ?s ?p ?o }`, e.g.
  * /root/reference/StructuredDynamics/osf/validator/checks/CheckPropertiesDefined.php:45-47):
  * `doc_id` = subject, `kind` = predicate, `text` = literal object,
  * `media_ref` = IRI object, `offset` = triple order within the record.
  */
final case class Span(
    kind: String,
    text: String,
    media_ref: String,
    offset: Int
)

final case class Document(
    doc_id: String,
    spans: Seq[Span]
)

/** Span with an optional asserted-datatype annotation — the OPTIONAL 5th
  * span field (the "span-level datatype seam"). Sources whose literals carry
  * datatype annotations (the reference's resultset values always do —
  * CheckDatatypePropertiesDatatype.php:188-192) use this shape; the checks
  * detect the extra field by schema and enable strict-mode datatype
  * comparison (`DATATYPE-...-100`) and datatype-qualified cardinality
  * counting. `datatype == null` means unannotated (the reference maps that
  * to rdfs:Literal at the value layer and xsd:string at the SPARQL
  * `datatype(?value)` layer — both conventions are preserved per call site).
  */
final case class AnnotatedSpan(
    kind: String,
    text: String,
    media_ref: String,
    offset: Int,
    datatype: String
)

final case class AnnotatedDocument(
    doc_id: String,
    spans: Seq[AnnotatedSpan]
)

/** One violation row — the Spark-native re-expression of the reference's
  * heterogeneous `errors[]` entries (checks/Check.php:17 and e.g.
  * CheckURIExistence.php:77-81). Id convention from the reference:
  * `<CHECK>-<code>` where code >= 100 is an error and the 50-series is a
  * warning (CheckPropertiesDefined.php:66 vs :84).
  */
final case class Violation(
    checkId: String,
    severity: String, // "error" | "warning"
    docId: String,    // may be null for dataset-level violations (e.g. undefined kind)
    kind: String,     // offending property/kind; null when not applicable
    value: String,    // offending lexical value / URI; null when not applicable
    expected: String  // expected datatype/class/cardinality description; null when n/a
)

/** Per-partition pass/fail verdict + lineage, persisted alongside results
  * (north rule: "matching the reference's per-partition pass/fail and
  * violation rows, resumable from checkpoint with per-partition lineage +
  * metrics").
  */
final case class Verdict(
    partitionId: Int,
    checkId: String,
    pass: Boolean,
    nViolations: Long,
    nDocs: Long,
    snapshotId: String,
    constraintHash: String
)

/** Single-pass per-column profiling row (north star: count / null /
  * distinct-sketch / min / max / histogram sketch).
  */
final case class ColumnProfile(
    column: String,
    count: Long,
    nulls: Long,
    approxDistinct: Long,
    min: String,
    max: String
)
