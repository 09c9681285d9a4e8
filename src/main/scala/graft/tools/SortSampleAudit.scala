package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Dev audit (r21): find every declared query whose GLOBAL presentation
  * sort sits directly on an exchange-free pipeline. A global SortExec is
  * preceded by a range exchange whose RangePartitioner SAMPLES its child
  * to pick bounds — if there is no shuffle exchange (a natural
  * materialization barrier under AQE) anywhere below, the sample pass
  * re-executes the ENTIRE upstream pipeline down to the scans, i.e. the
  * query pays its own compute twice. Prints the operator census of the
  * re-executed subtree so the expensive offenders are rankable. AQE off:
  * the audit wants the plain tree shape, not runtime reoptimization.
  */
object SortSampleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        // the range exchange BELOW a global sort is the node whose child
        // the RangePartitioner samples — flag it when that child subtree
        // has no further shuffle (nothing materialized to re-read)
        val rangeExchanges = plan.collect {
          case e: ShuffleExchangeLike
            if e.outputPartitioning.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] => e
        }
        rangeExchanges.foreach { s =>
          val below = s.child
          val shuffles = below.collect { case e: ShuffleExchangeLike => e }
          if (shuffles.isEmpty) {
            def cnt(p: SparkPlan => Boolean) = below.collect {
              case x if p(x) => x }.length
            val gens = cnt(_.nodeName == "Generate")
            val joins = cnt(_.nodeName.contains("Join"))
            val scans = cnt(_.nodeName.toLowerCase.contains("scan"))
            val ops = below.collect { case x => x }.length
            println(f"$name%-28s sort-over-no-exchange ops=$ops gens=$gens joins=$joins scans=$scans")
          }
        }
      } catch {
        case t: Throwable =>
          println(s"$name AUDIT-FAIL ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
