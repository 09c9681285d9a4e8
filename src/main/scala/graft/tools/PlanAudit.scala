package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: physical-plan audit over every registered query. Prints one
  * line per query with operator counts that matter at 100 TB — exchanges
  * (shuffles), join strategies, nested-loop/cartesian fallbacks — so plan
  * regressions are visible without the Spark UI. Not part of the driver
  * contract.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).length
        val flags = Seq(
          "xchg" -> n("Exchange (?:hash|range|Single)"),
          "bcast" -> n("BroadcastExchange"),
          "bhj" -> n("BroadcastHashJoin"),
          "smj" -> n("SortMergeJoin"),
          "bnlj" -> n("BroadcastNestedLoopJoin"),
          "cart" -> n("CartesianProduct"),
          "gen" -> n("Generate"),
          "winNodes" -> n("Window"))
          .filter(_._2 > 0)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        val pushed = if (plan.contains("PushedFilters: [I") ||
          plan.contains("PushedFilters: [G")) "pushed" else ""
        println(f"$name%-28s $flags $pushed")
      } catch {
        case e: Throwable => println(f"$name%-28s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
