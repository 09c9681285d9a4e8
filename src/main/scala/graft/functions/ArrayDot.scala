package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two ARRAY<BIGINT> columns — the hot scalar
  * of the similarity suite (SURVEY.md §2.9 X3), where embeddings are
  * quantized to longs (`floor(x * 1e6)`) so partial-aggregation order can
  * never change a result.
  *
  * Why a native expression: the composable form
  * `aggregate(zip_with(a, b, _ * _), 0L, _ + _)` is a pair of higher-order
  * functions, which Spark evaluates INTERPRETED (per-element lambda
  * dispatch, boxed accumulator) and which allocates the zipped array. This
  * is one generated loop over the two unsafe arrays — no allocation, stays
  * inside WholeStageCodegen — and it runs once per candidate pair, the
  * multiplicative hot path of every ANN query.
  *
  * Semantics mirror the HOF form exactly: NULL if either array is NULL, if
  * the lengths differ (zip_with pads with NULL), or if any element is NULL.
  *
  * Overflow caveat: this loop wraps silently on long overflow (plain Java
  * `*`/`+`), matching the HOF form only under the default
  * `spark.sql.ansi.enabled=false`; with ANSI on, the HOF form would raise
  * instead. Quantized embeddings (|x| ≤ 1e6-scale per component, dim 64)
  * stay far below 2^63, so the divergence is unreachable in this engine's
  * usage.
  */
case class LongArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LongArrayDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {

  /** Shared by interpreted eval and tests; null on length/element mismatch. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Column-API entry point: both sides must already be ARRAY<BIGINT>. */
  def longArrayDot(a: Column, b: Column): Column =
    Bridge.column(LongArrayDot(Bridge.expression(a), Bridge.expression(b)))
}
