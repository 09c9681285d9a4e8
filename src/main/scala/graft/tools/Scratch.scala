package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: ad-hoc stage attribution for the round-20 optimization
  * pass (noop-sink timing per guide §1.4). Not part of the declared
  * surface; edited freely between measurements.
  *
  * Current experiment: shuffle-codec A/B (guide §2.3 "Compression") on
  * the corpus-chars-grain exchanges — `spark.io.compression.codec` is a
  * core conf, so each codec gets its own JVM: pass the codec as arg 2.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val codec = if (args.length > 1) args(1) else "lz4"
    val queries = if (args.length > 2) args(2).split(",").toSeq
      else Seq("q_substring_dedup_hashed")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.io.compression.codec", codec)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000L).selectExpr("sum(id)").collect()
    println(s"codec in effect: " +
      spark.sparkContext.getConf.get("spark.io.compression.codec"))
    queries.foreach { q =>
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"$q [$codec]")
        graft.SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"CODEC_AB $codec $q%-30s ${ts.map(t => f"$t%8.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
