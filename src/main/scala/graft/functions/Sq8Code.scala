package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SQ8 scalar quantization of an ARRAY<FLOAT> embedding: one generated
  * loop computing `sc = max(|x_i|)` (1 when the vector is all-zero) and
  * `code_i = floor(x_i / sc * 127)` — the int8 code vector of the SQ8 ANN
  * tier (SURVEY.md §2.9 X3, `q_sim_knn_sq8`).
  *
  * Why a native expression: the composable form is TWO higher-order
  * `transform`s plus an `array_max` (SimilarityQueries.knnSq8's original
  * shape), all CodegenFallback — per-element interpreted lambda dispatch
  * and two intermediate arrays, on the corpus-scan hot path that touches
  * every vector. This is one codegen'd two-pass loop over the unsafe
  * float array into one primitive long array.
  *
  * Arithmetic is bit-identical to the HOF form and the DuckDB mirror:
  * float→double widening is exact, abs/max are exact, and
  * `(x / sc) * 127` runs the same IEEE ops in the same order, so
  * engine-portable determinism is preserved. NULL input → NULL; a NULL
  * element → NULL result (a null code would poison every downstream
  * integer dot anyway).
  */
case class Sq8Code(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_code"

  override protected def nullSafeEval(input: Any): Any =
    Sq8Code.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sc = ctx.freshName("sc")
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $sc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = Math.abs((double) $a.getFloat($i));
         |  if ($v > $sc) $sc = $v;
         |}
         |if (!${ev.isNull}) {
         |  if ($sc == 0.0) $sc = 1.0;
         |  long[] $codes = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $codes[$i] = (long) Math.floor(
         |      ((double) $a.getFloat($i) / $sc) * 127.0);
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq8Code {

  /** Shared by interpreted eval and tests; null on a null element. */
  def encode(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var sc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = math.abs(a.getFloat(i).toDouble)
      if (v > sc) sc = v
      i += 1
    }
    if (sc == 0.0) sc = 1.0
    val codes = new Array[Long](n)
    i = 0
    while (i < n) {
      codes(i) = math.floor((a.getFloat(i).toDouble / sc) * 127.0).toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  /** Column-API entry point: input must be ARRAY<FLOAT>. */
  def sq8Code(emb: Column): Column =
    Bridge.column(Sq8Code(Bridge.expression(emb)))
}
