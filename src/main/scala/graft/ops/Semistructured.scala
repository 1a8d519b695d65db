package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured (JSON-in-string) column handling — every event lake
  * carries a JSON props/payload column, and at 100 TB the difference
  * between "parse once into typed columns, prune thereafter" and "re-parse
  * per predicate" is a full corpus re-read. (Engine-native addition; the
  * reference's JSON surface is report OUTPUT only, `dvt:131-135`.)
  *
  *  - [[jsonField]] is the cheap single-path probe (`get_json_object`) for
  *    one-off predicates;
  *  - [[parseTyped]] is the bulk path: `from_json` with an explicit schema
  *    into ONE struct column, then [[flatten]] splays it into top-level
  *    columns so downstream projections prune normally. Schema explicit by
  *    design — `schema_of_json` sampling infers per-batch-divergent types
  *    on a 100 TB lake; a pipeline should pin its contract.
  */
object Semistructured {

  /** One JSON-path field as a string column (null for missing/invalid —
    * Spark's permissive default, the right behavior for a dirty lake).
    */
  def jsonField(json: Column, path: String): Column =
    get_json_object(json, path)

  /** Parse a JSON string column into a typed struct column `as`. */
  def parseTyped(df: DataFrame, json: String, schema: StructType,
                 as: String = "props_t"): DataFrame =
    df.withColumn(as, from_json(col(json), schema))

  /** Splay a struct column's fields into top-level columns (dropping the
    * struct), so column pruning reaches the individual fields.
    */
  def flatten(df: DataFrame, structCol: String): DataFrame = {
    val fields = df.schema(structCol).dataType.asInstanceOf[StructType]
      .fieldNames.toSeq
    df.select(col("*") +:
      fields.map(f => col(s"$structCol.$f").as(f)): _*).drop(structCol)
  }
}
