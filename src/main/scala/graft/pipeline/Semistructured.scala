package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Typed projection of semi-structured (JSON-string) columns — event
  * `props`, document metadata, API payloads riding along as strings.
  *
  * The scale rule, stated once: ALWAYS pass an explicit schema.
  * Schema-on-read inference (`spark.read.json` on a string dataset, or
  * `schema_of_json` fed from the data) needs an extra full pass over
  * the corpus — at 100 TB that is a second 100 TB scan before any real
  * work — and folds every observed key into one driver-side schema, so
  * a high-cardinality key space (user-defined attributes) OOMs the
  * driver. `from_json` with a declared schema is the opposite shape:
  * one codegen-adjacent map over the string column, no extra pass, no
  * driver state, and Catalyst prunes the parse to the fields actually
  * referenced. Production pipelines declare the contract and let
  * undeclared attributes stay in the string.
  */
object Semistructured {

  /** Flatten `jsonCol` into typed top-level columns, one per `schema`
    * field, each named `prefix + fieldName` and appended after the
    * existing columns (the JSON string column is kept — it still
    * holds any undeclared attributes).
    *
    * Malformed documents and missing attributes yield NULL
    * (PERMISSIVE parse), never errors: on a 100 TB corpus bad rows
    * are data to filter downstream, not a reason to kill the job. */
  def extractJson(df: DataFrame, jsonCol: String, schema: StructType,
                  prefix: String = ""): DataFrame = {
    require(df.columns.contains(jsonCol), s"no column $jsonCol")
    val outNames = schema.fieldNames.map(prefix + _)
    val clash = outNames.filter(df.columns.contains)
    require(clash.isEmpty,
      s"extracted columns collide with existing ones: ${clash.mkString(", ")}" +
        " — pass a distinguishing prefix")
    // one from_json shared across the projected fields: Catalyst
    // either dedups it as a common subexpression or (OptimizeJsonExprs)
    // splits it into per-field parses with pruned single-field schemas
    // — both non-redundant; SemistructuredSpec pins the plan shape
    val parsed = from_json(col(jsonCol), schema)
    df.select(df.columns.map(col) ++
      schema.fields.map(f => parsed.getField(f.name).as(prefix + f.name)): _*)
  }

  /** One attribute by JSONPath with an explicit target type —
    * `get_json_object` + cast. For pulling a single value inside a
    * larger expression; for several attributes prefer [[extractJson]]
    * (one parse) over repeated path probes. */
  def jsonAttr(jsonCol: Column, path: String, as: DataType): Column =
    get_json_object(jsonCol, path).cast(as)

  /** Parse a JSON-string column into Spark's native VARIANT type —
    * the column you PERSIST when the attribute set is open-ended.
    *
    * Where [[extractJson]] is the right call for a declared contract,
    * VARIANT is the 100 TB answer for the undeclared remainder: the
    * text parses ONCE (here, at ingest) into a binary encoding, and
    * every later query's `variant_get` path probe is a direct binary
    * walk — no re-tokenizing the string per query per attribute.
    * Parquet writers shred frequent variant fields into typed
    * subcolumns with statistics, so pruning and predicate pushdown
    * reach into the semi-structured data the way they reach typed
    * columns; a JSON string column offers neither. Malformed
    * documents become NULL (`try_parse_json`), same PERMISSIVE
    * posture as [[extractJson]]. */
  def toVariant(df: DataFrame, jsonCol: String,
                variantCol: String): DataFrame = {
    require(df.columns.contains(jsonCol), s"no column $jsonCol")
    require(!df.columns.contains(variantCol),
      s"column $variantCol already exists")
    df.withColumn(variantCol, try_parse_json(col(jsonCol)))
  }

  /** One attribute out of a VARIANT column: `try_variant_get` with an
    * explicit target type (a path probe into the binary encoding —
    * no JSON text in sight). Missing paths and uncastable values
    * yield NULL, never errors. `targetType` is a Spark SQL type
    * string (`"long"`, `"string"`, `"double"`, …). */
  def variantAttr(variantCol: Column, path: String,
                  targetType: String): Column =
    try_variant_get(variantCol, path, targetType)
}
