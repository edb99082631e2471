package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Morton (Z-order) code: interleaves the low `bits` bits of each
  * element of an int-array column into one long, so lexicographic
  * order on the result approximates locality in ALL dimensions at
  * once. This is the layout primitive behind multi-dimensional file
  * skipping (see [[graft.layout.ZOrder]]): sort 100 TB by z-value
  * and a range predicate on ANY of the interleaved columns maps to
  * a small fraction of files' [min,max] z-ranges, where a plain
  * sort serves only its leading column.
  *
  * Input: `array(bucket_0, ..., bucket_{n-1})` ints in
  * `[0, 2^bits)`; requires `n * bits <= 63`. Bit j of bucket c lands
  * at position `j * n + c` — dimension-alternating, most-significant
  * bits compare first.
  */
case class InterleaveBits(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"interleave_bits expects array<int>, got ${t.sql}")
  }
  override def prettyName: String = "interleave_bits"

  override protected def nullSafeEval(input: Any): Any =
    InterleaveBits.morton(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.InterleaveBits.morton($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): InterleaveBits =
    copy(child = newChild)
}

object InterleaveBits {

  def morton(buckets: ArrayData, bits: Int): Long = {
    val n = buckets.numElements()
    require(n * bits <= 63, s"$n dims x $bits bits exceeds a long")
    var out = 0L
    var b = 0
    while (b < bits) {
      var c = 0
      while (c < n) {
        out |= ((buckets.getInt(c).toLong >>> b) & 1L) << (b * n + c)
        c += 1
      }
      b += 1
    }
    out
  }
}
