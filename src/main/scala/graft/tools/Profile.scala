package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: phase timing for the heaviest queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000L).selectExpr("sum(id)").collect() // warmup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    val sh = docs.withColumn("toks", split($"text", " "))
      .select($"doc_id", explode(
        expr("transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("sh"))
    time("explode count")(sh.count())
    val sigs = sh.groupBy($"doc_id").agg(
      min(md5(concat(lit("0|"), $"sh"))).as("h0"),
      (1 until 8).map(i => min(md5(concat(lit(s"$i|"), $"sh"))).as(s"h$i")): _*)
    time("sigs count")(sigs.count())
    val cached = sigs.cache()
    time("sigs cache mat")(cached.count())
    val bands = cached.select($"doc_id", explode(array(
      (0 until 8).map(i => struct(lit(i).as("b"), col(s"h$i").as("v"))): _*)).as("band"))
      .select($"doc_id", $"band.b".as("b"), $"band.v".as("v"))
    val ok = bands.groupBy($"b", $"v").agg(count(lit(1)).as("bn"))
      .filter($"bn" >= 2 && $"bn" <= 50).select($"b", $"v")
    val inB = bands.join(ok, Seq("b", "v"))
    val pairs = inB.as("x").join(inB.as("y"),
      col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("bb")).distinct()
    time("pairs")(pairs.count())
    cached.unpersist()
    spark.stop()
  }
}
