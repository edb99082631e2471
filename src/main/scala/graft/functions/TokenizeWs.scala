package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd whitespace tokenizer: byte-for-byte the same result as
  * the portable `filter(split(text, '\\s+'), t -> length(t) > 0)`
  * (optionally + `array_distinct`) that the DuckDB oracle mirrors
  * with `list_filter(string_split_regex(...))` — but in ONE scan of
  * the UTF-8 bytes instead of a regex split plus an INTERPRETED
  * lambda filter. Spark's higher-order functions are CodegenFallback,
  * so the HOF form both pays per-token boxed lambda calls and splits
  * every enclosing whole-stage-codegen span; this expression does
  * neither, and (unlike a fallback expression) participates in
  * codegen subexpression elimination when a collapsed projection
  * references the token array more than once.
  *
  * Equivalence notes (pinned by KernelPropSpec):
  *  - Java's `\s` is exactly {TAB, LF, VT, FF, CR, SPACE} — six ASCII
  *    bytes that can never occur inside a multi-byte UTF-8 sequence,
  *    so splitting on raw bytes is safe for any Unicode text.
  *  - `split(_, _, -1)` keeps boundary empties; the length filter
  *    drops them — identical to collecting maximal non-space runs.
  *  - `array_distinct` keeps first occurrence order; so does the
  *    insertion-ordered set here.
  */
case class TokenizeWs(child: Expression, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tokenize_ws expects string, got ${t.sql}")
  }
  override def prettyName: String =
    if (distinct) "token_set_ws" else "tokens_ws"

  override protected def nullSafeEval(input: Any): Any =
    TokenizeWs.tokenize(input.asInstanceOf[UTF8String], distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenizeWs.tokenize($c, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeWs =
    copy(child = newChild)
}

object TokenizeWs {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Maximal runs of non-whitespace bytes, in document order;
    * `distinct` keeps the first occurrence of each token.
    */
  def tokenize(s: UTF8String, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        if (seen == null || seen.add(tok)) out.add(tok)
      }
    }
    new GenericArrayData(out.toArray)
  }
}
