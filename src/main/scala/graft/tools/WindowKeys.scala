package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Dev scratch: dump every physical window's partition keys per declared
  * query — the inventory the RegistrySpec bounded-window-key dictionary
  * is built from. */
object WindowKeys {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def walk(p: SparkPlan): Seq[Seq[String]] = {
      val here = p match {
        case w: WindowExec if w.partitionSpec.nonEmpty =>
          Seq(w.partitionSpec.flatMap(_.references.map(_.name)).distinct)
        case w: WindowGroupLimitExec if w.partitionSpec.nonEmpty =>
          Seq(w.partitionSpec.flatMap(_.references.map(_.name)).distinct)
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(walk)
    }
    graft.Registry.all.foreach { q =>
      try {
        val keys = walk(q.fn(spark, dir).queryExecution.executedPlan)
        keys.distinct.foreach(ks =>
          println(s"WINKEY\t${q.name}\t${ks.sorted.mkString(",")}"))
      } catch {
        case t: Throwable => println(s"WINKEY_ERR\t${q.name}\t$t")
      }
    }
    spark.stop()
  }
}
