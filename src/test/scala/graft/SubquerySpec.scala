package graft

import graft.analytics.SubqueryQueries
import org.scalatest.funsuite.AnyFunSuite

/** Pins that Catalyst actually DECORRELATES the subquery suite: no subquery
  * predicate survives into the optimized plan (each would otherwise execute
  * as a per-outer-row lookup — the scale-killer the rewrite exists to
  * prevent), and the rewritten joins are the hand-written shapes.
  */
class SubquerySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("correlated scalar subquery decorrelates to aggregate + join") {
    val df = SubqueryQueries.subqueryScalar(spark, sf)
    val opt = optimized(df)
    assert(!opt.contains("scalar-subquery"), opt)
    // the rewrite yields an aggregate over lineitem re-joined on partkey
    assert(opt.contains("Aggregate") && opt.contains("Join"), opt)
    val phys = physical(df)
    assert(!phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("CartesianProduct"), phys)
    assert(df.count() > 0)
  }

  test("EXISTS / NOT EXISTS rewrite to semi / anti joins") {
    val df = SubqueryQueries.subqueryExists(spark, sf)
    val opt = optimized(df)
    assert(!opt.toLowerCase.contains("exists"), opt)
    assert(opt.contains("LeftSemi") && opt.contains("LeftAnti"), opt)
    val phys = physical(df)
    assert(!phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("CartesianProduct"), phys)
    assert(df.count() > 0)
  }

  test("IN over aggregated subquery rewrites to a semi join") {
    val df = SubqueryQueries.subqueryIn(spark, sf)
    val opt = optimized(df)
    assert(!opt.contains("list#") && !opt.contains("IN ("), opt)
    assert(opt.contains("LeftSemi"), opt)
    assert(df.count() > 0)
  }
}
