package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic primitives.
  *
  * The driver's correctness gate compares Spark results against DuckDB
  * running "the same" SQL, so any hash/pseudo-randomness used inside an
  * oracle-checked query must produce bit-identical values in both
  * engines. Spark's `hash()` (Murmur3) and DuckDB's `hash()` differ, so
  * we standardize on md5 — identical everywhere — and derive a 60-bit
  * integer from its first 15 hex digits.
  *
  * Each primitive has a Spark `Column` form and a DuckDB SQL-text form
  * (used when generating oracle SQL strings).
  */
object Portable {

  /** 60-bit non-negative integer hash of a string (Spark side).
    * Backed by the codegen'd [[Md5Long60]] expression; semantically
    * `conv(substring(md5(c),1,15),16,10)` — the form the DuckDB
    * oracle runs.
    */
  def md5Long(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      Md5Long60(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** Same hash, DuckDB SQL text. `('0x'||hex15)::BIGINT` parses hex. */
  def md5LongSql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  /** Fold-order-free money sum: accumulate in decimal, round on the
    * EXACT total, return double.
    *
    * `round(sum(double), 2)` is a latent cross-engine flake: the two
    * engines fold partial sums in different orders, so totals differ
    * in the last ulp, and once the total is large enough an ulp
    * spans a half-cent boundary (first bitten at the 6M-row sf1
    * fixtures). The fixture money columns are exact 2-dp values, so
    * the per-row double→decimal(18,4) cast is lossless, the decimal
    * sum is associative, and rounding the exact total is half-away-
    * from-zero in both engines (positive exact decimals: Spark
    * HALF_UP ≡ DuckDB's rounding).
    */
  def moneySum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast("decimal(18,4)")), scale).cast("double")

  def moneySumSql(expr: String, scale: Int = 2): String =
    s"CAST(round(sum(CAST($expr AS DECIMAL(18,4))), $scale) AS DOUBLE)"

  /** Fold-order-free money average: exact decimal sum, ONE double
    * division, and — deliberately — no rounding. Rounding the
    * quotient is its own trap: when the group count factors as
    * 2ᵃ·5ᵇ the exact quotient terminates and can land exactly on a
    * half-boundary, where the engines' rounding rules disagree
    * (Spark BigDecimal HALF_UP vs a scaled-multiply round). The
    * unrounded quotient of identical doubles is identical.
    */
  def moneyAvg(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double") / count(lit(1))

  def moneyAvgSql(expr: String): String =
    s"(CAST(sum(CAST($expr AS DECIMAL(18,4))) AS DOUBLE) / count(*))"

  /** Whitespace tokenization shared by the text operators: split on
    * runs of whitespace, drop empties (Spark `split` and DuckDB
    * `string_split_regex` both emit empty strings at the boundaries).
    * Backed by the codegen'd [[TokenizeWs]] kernel — semantically
    * `filter(split(c, '\\s+'), t -> length(t) > 0)`, the form the
    * DuckDB oracle runs (KernelPropSpec pins the equivalence).
    */
  def tokens(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      TokenizeWs(org.apache.spark.sql.GraftSqlBridge.expression(c), distinct = false))

  def tokensSql(expr: String): String =
    s"list_filter(string_split_regex($expr, '\\s+'), t -> length(t) > 0)"

  /** Distinct tokens (set semantics for Jaccard et al). */
  def tokenSet(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      TokenizeWs(org.apache.spark.sql.GraftSqlBridge.expression(c), distinct = true))

  def tokenSetSql(expr: String): String =
    s"list_distinct(${tokensSql(expr)})"

  /** `array_sort(transform(arr, t -> md5long60(t)))` via the
    * one-pass [[Md5Sorted]] kernel — the sorted-hash form the
    * merge-scan intersect consumes.
    */
  def md5Sorted(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      Md5Sorted(org.apache.spark.sql.GraftSqlBridge.expression(c)))
}
