package graft.plans

import graft.functions.{Haversine, JaroWinkler, LongArrayDot, RollingHash64, SortedArrayContains, Sq8Code}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's custom Catalyst expressions for
  * SQL use:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT haversine_km(lat, lon, 41.8781, -87.6298) ...")
  * }}}
  *
  * For sessions we don't construct (the driver owns the session in the
  * Verify/Bench contract), [[GraftExtensions.registerOn]] installs the same
  * functions on an existing session's registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.haversineEntry)
    e.injectFunction(GraftExtensions.longArrayDotEntry)
    e.injectFunction(GraftExtensions.sq8CodeEntry)
    e.injectFunction(GraftExtensions.jaroWinklerEntry)
    e.injectFunction(GraftExtensions.sortedContainsEntry)
    e.injectFunction(GraftExtensions.rollingHashEntry)
    e.injectOptimizerRule(_ => HaversineBoundingBox)
  }
}

object GraftExtensions {
  private def haversineBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 4, "haversine_km(lat1, lon1, lat2, lon2)")
    Haversine.ofAny(args(0), args(1), args(2), args(3))
  }

  val haversineEntry: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("haversine_km"),
    new ExpressionInfo(classOf[Haversine].getName, "haversine_km"),
    haversineBuilder)

  private def longArrayDotBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "long_array_dot(array<bigint>, array<bigint>)")
    LongArrayDot(args(0), args(1))
  }

  val longArrayDotEntry: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("long_array_dot"),
    new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
    longArrayDotBuilder)

  private def sq8CodeBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "sq8_code(array<float>)")
    Sq8Code(args(0))
  }

  val sq8CodeEntry: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("sq8_code"),
    new ExpressionInfo(classOf[Sq8Code].getName, "sq8_code"),
    sq8CodeBuilder)

  private def jaroWinklerBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "jaro_winkler(string, string)")
    JaroWinkler(args(0), args(1))
  }

  val jaroWinklerEntry: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    jaroWinklerBuilder)

  private def sortedContainsBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "sorted_contains(sorted array<string>, string)")
    SortedArrayContains(args(0), args(1))
  }

  val sortedContainsEntry: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("sorted_contains"),
    new ExpressionInfo(classOf[SortedArrayContains].getName, "sorted_contains"),
    sortedContainsBuilder)

  private def rollingHashBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "rolling_hash64(string, window int)")
    RollingHash64(args(0), args(1))
  }

  val rollingHashEntry: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("rolling_hash64"),
    new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash64"),
    rollingHashBuilder)

  /** Install on an already-built session (idempotent). */
  def registerOn(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "haversine_km", haversineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_array_dot", longArrayDotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sq8_code", sq8CodeBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", jaroWinklerBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_contains", sortedContainsBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64", rollingHashBuilder, "built-in")
  }
}
