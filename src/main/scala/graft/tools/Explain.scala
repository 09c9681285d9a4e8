package graft.tools
import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of one declared query — the plan-audit
  * loop ("is this the plan you'd want at 100 TB") as a one-liner. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_PRESORT_CKPT=off reproduces the pre-r21 plans (plain orderBy
    // instead of the lazy pre-sort checkpoint) for before/after captures
    if (sys.env.get("GRAFT_PRESORT_CKPT").contains("off"))
      spark.conf.set("spark.graft.presort.ckpt", "false")
    args.tail.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
