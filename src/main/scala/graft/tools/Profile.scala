package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: cold/warm timing for the heaviest queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q_dedup_minhash_lsh", "q_dedup_ngram_jaccard", "q_dedup_simhash")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000L).selectExpr("sum(id)").collect() // warmup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      time(s"$n cold")(fn(spark, dir).queryExecution.toRdd.count())
      time(s"$n warm")(fn(spark, dir).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
