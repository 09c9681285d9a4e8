package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, QuaternaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Great-circle distance in kilometers between two (lat, lon) points.
  *
  * The reference drops the API's lat/lon/heading fields
  * (get_train_status.py:111-122 keeps 8 of 15 fields; lat/lon appear in
  * tests/helper_files/mock_train_location_response.py:23-25); we keep them
  * (SURVEY.md §1.2) and geo distance is the P12 math-scalar candidate that
  * built-ins don't cover (SURVEY.md §4). Implemented as a native Catalyst
  * expression with full codegen — no closure/serialization cost, stays
  * inside WholeStageCodegen — rather than a Scala UDF.
  */
case class Haversine(lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression)
  extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def dataType: DataType = DoubleType

  override def prettyName: String = "haversine_km"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Haversine.km(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la1, lo1, la2, lo2) =>
      s"${ev.value} = graft.functions.Haversine.km($la1, $lo1, $la2, $lo2);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)
}

object Haversine {
  val EarthRadiusKm = 6371.0088

  /** Shared by interpreted eval and generated code.
    *
    * `a` is clamped into [0, 1] before `asin(sqrt(a))`: near-antipodal
    * pairs round `a` to 1.0000000000000002 in double arithmetic (found
    * by the r17 property fuzz — ~5% of random antipodes hit it), and
    * asin(>1) is NaN, so an unclamped form silently poisons any
    * aggregate that sums distances over a corpus containing one such
    * pair. The low clamp covers out-of-range latitudes (|lat| > 90
    * makes the cos product negative), keeping the kernel total on
    * garbage coordinates — one bad row must never NaN a fleet-wide
    * roll-up. In-range, non-antipodal inputs are unaffected: a < 1 by
    * more than one ulp everywhere the clamp is not needed. */
  def km(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    2 * EarthRadiusKm * math.asin(math.sqrt(math.max(0.0, math.min(1.0, a))))
  }

  /** Smart constructor coercing inputs to double (SQL int literals etc.). */
  def ofAny(lat1: Expression, lon1: Expression,
      lat2: Expression, lon2: Expression): Haversine =
    Haversine(Cast(lat1, DoubleType), Cast(lon1, DoubleType),
      Cast(lat2, DoubleType), Cast(lon2, DoubleType))

  /** Column-API entry point. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    Bridge.column(ofAny(Bridge.expression(lat1), Bridge.expression(lon1),
      Bridge.expression(lat2), Bridge.expression(lon2)))
}
