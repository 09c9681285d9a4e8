package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    // local[4,2]: maxFailures=2, so a task's first-attempt failure is
    // re-driven once — TaskRetrySpec exercises the re-drive contract
    // SURVEY §4 maps from the reference's retry loop; plain local[N]
    // would fail the whole job on the first injected task failure
    val s = SparkSession.builder()
      .master("local[4,2]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}
