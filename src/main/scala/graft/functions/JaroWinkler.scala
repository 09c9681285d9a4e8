package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity in [0, 1] — the edit-tier scorer for short keys
  * (names, brands, labels) where Levenshtein's unit-cost model over-penalizes
  * transpositions. Spark ships `levenshtein` but no Jaro-Winkler; this is the
  * P11/X2e gap filled as a native codegen expression (a Scala UDF would box
  * both strings and break whole-stage codegen on the hot comparison loop).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (the oracle
  * engine), which follows Winkler's ORIGINAL strcmp95, not the
  * Wikipedia-popularized variant — the two differ, probed empirically
  * (r17, ~8% of random short dense strings): match window
  * ⌊max(|a|,|b|)/2⌋ − 1; transpositions are the matched-sequence
  * mismatch count under INTEGER division by two (strcmp95's
  * `N_trans / 2` in C int arithmetic — the fractional `t/2.0` form
  * scores strictly lower whenever the mismatch count is odd, e.g.
  * "bacccb"/"cbab" 0.764 fractional vs 0.806 DuckDB); two empty
  * strings score 0, not 1 (strcmp95 treats blank input as no
  * evidence); Winkler prefix boost p = 0.1 over a ≤ 4-char common
  * prefix, applied only when jaro > 0.7 (strict). Comparison runs over
  * UTF-8 BYTES, exactly like DuckDB's (probed: "日本"/"本日" scores as
  * 6-byte strings, not 2-codepoint ones) — byte and codepoint results
  * coincide on ASCII keys, which is what the dictionary tier feeds it.
  * The full contract is pinned against an embedded strcmp95 reference
  * on generated strings, and that reference against DuckDB itself on
  * 21k generated cases (zero diffs).
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Shared by interpreted eval and generated code. */
  def sim(a: UTF8String, b: UTF8String): Double =
    simBytes(a.getBytes, b.getBytes)

  def simBytes(s1: Array[Byte], s2: Array[Byte]): Double = {
    val m1 = s1.length
    val m2 = s2.length
    // strcmp95/DuckDB: blank vs blank is 0 (no evidence), not 1
    if (m1 == 0 || m2 == 0) return 0.0
    val window = math.max(0, math.max(m1, m2) / 2 - 1)
    val f1 = new Array[Boolean](m1)
    val f2 = new Array[Boolean](m2)
    var matches = 0
    var i = 0
    while (i < m1) {
      val hi = math.min(m2 - 1, i + window)
      var j = math.max(0, i - window)
      while (j <= hi) {
        if (!f2(j) && s1(i) == s2(j)) {
          f1(i) = true; f2(j) = true; matches += 1
          j = hi // break
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched-sequence mismatches, halved under INTEGER
    // division (strcmp95's `N_trans / 2`; DuckDB matches it — the
    // fractional t/2.0 variant diverges on odd mismatch counts and
    // would flip threshold queries against the oracle)
    var t = 0
    var k = 0
    i = 0
    while (i < m1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / m1 + m / m2 + (m - (t / 2).toDouble) / m) / 3.0
    if (jaro > 0.7) {
      val cap = math.min(4, math.min(m1, m2))
      var l = 0
      while (l < cap && s1(l) == s2(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
