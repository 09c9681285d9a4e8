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

  private val statsDone =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register `tables` as external catalog tables (prefixed so several sf
    * dirs can coexist) and compute table + column statistics — the input
    * the cost-based optimizer's join-reorder DP needs. Done once per
    * (session, dir); on a real deployment this is the scheduled
    * `ANALYZE TABLE` pass after each load. Returns the table-name prefix. */
  def ensureStats(spark: SparkSession, dir: String,
      tables: Seq[String]): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    val prefix = s"cbo_${key}_"
    if (statsDone.add(s"${System.identityHashCode(spark)}|$dir")) {
      tables.foreach { t =>
        val name = prefix + t
        spark.sql(s"DROP TABLE IF EXISTS $name")
        spark.sql(s"CREATE TABLE $name USING parquet LOCATION '$dir/$t.parquet'")
        spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
      }
    }
    prefix
  }

  /** Run `body` with the cost-based optimizer (and its join-reorder DP)
    * enabled, restoring the previous confs after. Callers must force
    * planning (e.g. touch `queryExecution.executedPlan`) inside `body` —
    * QueryExecution phases are lazy vals, so the frozen plan keeps the
    * CBO decisions while the session confs revert for everyone else. */
  def withCbo[A](spark: SparkSession)(body: => A): A = {
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val prevReorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try body finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevReorder)
    }
  }
}
