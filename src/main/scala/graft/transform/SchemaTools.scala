package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema manipulation utilities.
  *
  * Capability parity with the reference's schema utils
  * (`lakehouse_engine/utils/schema_utils.py:120-180` — recursive struct
  * flattening) and the `flatten_schema` transformer
  * (`lakehouse_engine/transformers/column_reshapers.py:71-112`).
  */
object SchemaTools {

  /** Recursively flatten all struct columns: `a.b.c` -> `a_b_c`.
    *
    * Pure projection (no shuffle, codegen-friendly); arrays/maps are left
    * intact (explode is a separate transformer, as in the reference).
    *
    * @param maxDepth maximum nesting depth to unroll
    */
  def flatten(df: DataFrame, maxDepth: Int = 10, separator: String = "_"): DataFrame = {
    def cols(schema: StructType, prefix: String, path: String, depth: Int): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val fieldPath = if (path.isEmpty) s"`${f.name}`" else s"$path.`${f.name}`"
        val name = if (prefix.isEmpty) f.name else s"$prefix$separator${f.name}"
        f.dataType match {
          case st: StructType if depth < maxDepth => cols(st, name, fieldPath, depth + 1)
          case _ => Seq(col(fieldPath).as(name))
        }
      }
    df.select(cols(df.schema, "", "", 0): _*)
  }

  /** Parse a StructType from its JSON representation (reference schemas are
    * `StructType.fromJson`-compatible — `utils/schema_utils.py:20-34`). */
  def schemaFromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]

  /** Parse a schema from DDL ("a INT, b STRING") as an alternative. */
  def schemaFromDdl(ddl: String): StructType = StructType.fromDDL(ddl)

  /** Accept either representation: StructType JSON (starts with '{') or DDL. */
  def schemaFromAny(s: String): StructType =
    if (s.trim.startsWith("{")) schemaFromJson(s) else schemaFromDdl(s)
}
