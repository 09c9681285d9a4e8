package graft.plans

import graft.functions.Haversine
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: derive a pushable bounding box from a haversine radius
  * predicate.
  *
  * `haversine_km(lat, lon, CLAT, CLON) < R` is opaque to the parquet
  * reader — the scan reads everything and the filter runs post-scan. But
  * the circle is contained in a lat/lon box, and simple range predicates DO
  * push down to the scan (min/max row-group pruning + PushedFilters). The
  * rule conjoins the (conservative, strictly larger) box, leaving the exact
  * circle test in place:
  *
  *   Filter(hav < R)  →  Filter(hav < R && lat BETWEEN … && lon BETWEEN …)
  *
  * At 100 TB this is the difference between scanning the fleet's whole
  * history and scanning the row groups near the target station.
  *
  * Applies when the center and radius are foldable; skips longitude bounds
  * near the poles and boxes that would cross the antimeridian.
  */
object HaversineBoundingBox extends Rule[LogicalPlan] {

  private val KmPerDegLat = 110.0   // < 110.574 ⇒ window strictly larger
  private val KmPerDegLonEq = 111.0 // < 111.320 ⇒ window strictly larger

  private def lit(d: Double): Literal = Literal(d, DoubleType)

  private def fold(e: Expression): Option[Double] =
    if (e.foldable) e.eval() match {
      case d: java.lang.Double => Some(d)
      case _ => None
    } else None

  /** (distExpr, radius) when the conjunct is a radius test on haversine. */
  private def radiusTest(e: Expression): Option[(Haversine, Double)] = e match {
    case LessThan(h: Haversine, r) => fold(r).map(h -> _)
    case LessThanOrEqual(h: Haversine, r) => fold(r).map(h -> _)
    case GreaterThan(r, h: Haversine) => fold(r).map(h -> _)
    case GreaterThanOrEqual(r, h: Haversine) => fold(r).map(h -> _)
    case _ => None
  }

  private def boundingBox(h: Haversine, r: Double): Option[Expression] = {
    for {
      clat <- fold(h.lat2)
      clon <- fold(h.lon2)
      if r > 0
    } yield {
      val dLat = r / KmPerDegLat
      val latLo = clat - dLat
      val latHi = clat + dLat
      val latBound = And(
        GreaterThanOrEqual(h.lat1, lit(latLo)),
        LessThanOrEqual(h.lat1, lit(latHi)))
      val maxAbsLat = math.min(math.max(math.abs(latLo), math.abs(latHi)), 89.0)
      val kmPerDegLon = KmPerDegLonEq * math.cos(math.toRadians(maxAbsLat))
      val dLon = r / kmPerDegLon
      val lonLo = clon - dLon
      val lonHi = clon + dLon
      if (kmPerDegLon <= 1.0 || lonLo < -180.0 || lonHi > 180.0) latBound
      else And(latBound, And(
        GreaterThanOrEqual(h.lon1, lit(lonLo)),
        LessThanOrEqual(h.lon1, lit(lonHi))))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val extras = conjuncts
        .flatMap(radiusTest(_))
        .flatMap { case (h, r) => boundingBox(h, r) }
        // idempotence under fixed-point optimization: only add bounds that
        // aren't already present
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
        .flatMap(splitConjuncts)
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
      if (extras.isEmpty) f
      else Filter(extras.foldLeft(cond)(And(_, _)), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
