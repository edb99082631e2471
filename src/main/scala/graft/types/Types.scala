package graft.types

import org.apache.spark.sql.types._

/** Type system + identifier rules, the Spark-native re-expression of
  * the reference's ingestion layer contracts:
  *
  *  - inferred-dtype → warehouse type mapping with unknown→STRING
  *    fallback (reference backend/hive_manager.py:42-67);
  *  - DESCRIBE-style Hive type-name rendering;
  *  - table-name sanitization: non-alphanumerics → `_`, digit prefix
  *    → `table_` prepend, 32-char cap, 6-digit uniqueness suffix
  *    (reference backend/hive_manager.py:69-92). The reference's
  *    suffix is a wall-clock timestamp — non-deterministic — so the
  *    clock is injectable here (SURVEY.md §7 risk list).
  */
object Types {

  /** Inference dtype name → Spark DataType. Unknown names fall back
    * to StringType, the same rule as the reference's `_ → STRING`.
    */
  def toSpark(dtype: String): DataType = dtype.toLowerCase match {
    case "int8" | "tinyint"             => ByteType
    case "int16" | "smallint"           => ShortType
    case "int32" | "int"                => IntegerType
    case "int64" | "bigint"             => LongType
    case "float32" | "float"            => FloatType
    case "float64" | "double"           => DoubleType
    case "bool" | "boolean"             => BooleanType
    case "date"                         => DateType
    case "datetime" | "timestamp"       => TimestampType
    case _                              => StringType
  }

  /** Spark DataType → Hive DDL type name (for DESCRIBE-style output
    * and DDL generation).
    */
  def hiveName(dt: DataType): String = dt match {
    case ByteType            => "TINYINT"
    case ShortType           => "SMALLINT"
    case IntegerType         => "INT"
    case LongType            => "BIGINT"
    case FloatType           => "FLOAT"
    case DoubleType          => "DOUBLE"
    case BooleanType         => "BOOLEAN"
    case DateType            => "DATE"
    case _: TimestampType    => "TIMESTAMP"
    case StringType          => "STRING"
    case d: DecimalType      => s"DECIMAL(${d.precision},${d.scale})"
    case BinaryType          => "BINARY"
    case ArrayType(e, _)     => s"ARRAY<${hiveName(e)}>"
    case MapType(k, v, _)    => s"MAP<${hiveName(k)},${hiveName(v)}>"
    case StructType(fields)  =>
      fields.map(f => s"${f.name}:${hiveName(f.dataType)}").mkString("STRUCT<", ",", ">")
    case _                   => "STRING"
  }

  /** Maximum base length before the uniqueness suffix. */
  val MaxNameLength = 32

  /** Sanitize a raw table name. `suffix` replaces the reference's
    * 6-digit wall-clock suffix; pass None for a stable name.
    */
  def sanitizeTableName(raw: String, suffix: Option[String] = None): String = {
    val cleaned = raw.replaceAll("[^a-zA-Z0-9_]", "_")
    val prefixed = if (cleaned.isEmpty || cleaned.head.isDigit) s"table_$cleaned" else cleaned
    val base = prefixed.take(MaxNameLength)
    suffix match {
      case Some(sfx) => s"${base}_${sfx.takeRight(6)}"
      case None      => base
    }
  }

  /** Backtick-quote an identifier for SQL (the reference backticks
    * column names in DDL, hive_manager.py:161).
    */
  def quote(ident: String): String = "`" + ident.replace("`", "``") + "`"
}
