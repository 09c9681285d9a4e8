package graft

import org.apache.spark.sql.SparkSession

/** User entry point: a SparkSession wired for this engine — custom
  * functions/rules registered, scale-sane defaults — plus SQL-surface
  * registration of the test-lake tables so `spark.sql` works against them
  * directly.
  */
object GraftSession {

  /** Recommended session for this library. `shufflePartitions` should match
    * cluster parallelism (cores × executors in real deployments). */
  def build(master: String = "local[*]", shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register every test-lake table as a temp view (plus graft functions on
    * an existing session), enabling the full SQL surface:
    * {{{ spark.sql("SELECT haversine_km(...) FROM lineitem ...") }}} */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    plans.GraftExtensions.registerOn(spark)
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir)
        else Tables.load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
  }
}
