package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev scratch: ad-hoc stage attribution for the round-20 optimization
  * pass (noop-sink timing per guide §1.4). Not part of the declared
  * surface; edited freely between measurements. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000L).selectExpr("sum(id)").collect()

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(label)
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-50s ${ts.map(t => f"$t%6.2f").mkString(" ")} s")
    }

    val li = graft.Tables.lineitem(spark, dir)

    // OLD full profile (pre-r20 shape), inlined for A/B
    def oldProfile = {
      val cols = li.schema.fields.toSeq.filterNot(_.dataType.isInstanceOf[ArrayType])
      def minMaxStr(c: String, dt: DataType) = dt match {
        case DoubleType =>
          (min(col(c).cast(DecimalType(18, 2))).cast(StringType),
            max(col(c).cast(DecimalType(18, 2))).cast(StringType))
        case _: TimestampType | _: TimestampNTZType =>
          (unix_micros(min(col(c)).cast(TimestampType)).cast(StringType),
            unix_micros(max(col(c)).cast(TimestampType)).cast(StringType))
        case _ => (min(col(c)).cast(StringType), max(col(c)).cast(StringType))
      }
      val aggs = cols.flatMap { f =>
        val (mn, mx) = minMaxStr(f.name, f.dataType)
        Seq(count(col(f.name)).as(s"${f.name}__n"),
          count(lit(1)).minus(count(col(f.name))).as(s"${f.name}__nulls"),
          mn.as(s"${f.name}__min"), mx.as(s"${f.name}__max"))
      }
      val wide = li.agg(aggs.head, aggs.tail: _*)
      val nullL = lit(null).cast(LongType)
      val nullD = lit(null).cast(DoubleType)
      val nullS = lit(null).cast(StringType)
      val kvs = cols.map { f =>
        val (vl, vd, vs) = f.dataType match {
          case DoubleType => (nullL, col(f.name), nullS)
          case FloatType => (nullL, col(f.name).cast(DoubleType), nullS)
          case _: TimestampType | _: TimestampNTZType =>
            (unix_micros(col(f.name).cast(TimestampType)), nullD, nullS)
          case _: StringType => (nullL, nullD, col(f.name))
          case _: NumericType | _: BooleanType =>
            (col(f.name).cast(LongType), nullD, nullS)
          case _ => (nullL, nullD, col(f.name).cast(StringType))
        }
        struct(lit(f.name).as("c"), vl.as("vl"), vd.as("vd"), vs.as("vs"))
      }
      val distincts = li
        .select(explode(array(kvs: _*)).as("kv"))
        .select(col("kv.c").as("col_name"),
          col("kv.vl").as("vl"), col("kv.vd").as("vd"), col("kv.vs").as("vs"))
        .where(col("vl").isNotNull || col("vd").isNotNull || col("vs").isNotNull)
        .groupBy(col("col_name"), col("vl"), col("vd"), col("vs"))
        .agg(first(lit(1)))
        .groupBy(col("col_name")).agg(count(lit(1)).as("n_distinct"))
      val entries = cols.map { f =>
        struct(lit(f.name).as("col_name"),
          col(s"${f.name}__n").as("n"),
          col(s"${f.name}__nulls").as("n_nulls"),
          col(s"${f.name}__min").as("min_str"),
          col(s"${f.name}__max").as("max_str"))
      }
      wide.select(explode(array(entries: _*)).as("p"))
        .select(col("p.*"))
        .join(broadcast(distincts), Seq("col_name"), "left")
        .select(col("col_name"), col("n"), col("n_nulls"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          col("min_str"), col("max_str"))
        .orderBy(col("col_name"))
    }
    def newProfile = graft.analytics.Profiler.profileLineitem(spark, dir)

    // result equality check first
    val a = oldProfile.collect().map(_.toString).toSeq
    val b = newProfile.collect().map(_.toString).toSeq
    println("RESULTS IDENTICAL: " + (a == b) + s" (${a.size} rows)")
    if (a != b) {
      a.zip(b).filter { case (x, y) => x != y }.foreach { case (x, y) =>
        println(s"  OLD $x\n  NEW $y")
      }
    }

    oldProfile.write.format("noop").mode("overwrite").save()
    newProfile.write.format("noop").mode("overwrite").save()
    time("profile OLD full")(oldProfile)
    time("profile NEW full")(newProfile)
    time("profile OLD full (2)")(oldProfile)
    time("profile NEW full (2)")(newProfile)

    // confirm the dedup exchange is reused at runtime (AQE stage reuse)
    val qe = newProfile.queryExecution
    qe.toRdd.count()
    val ex = qe.executedPlan.toString
    val reused = ex.contains("ReusedExchange") || ex.contains("StageReuse") ||
      "TableCacheQueryStage|ShuffleQueryStage".r.findAllIn(ex).size > 0
    println("executed plan scans: " +
      "Scan parquet".r.findAllIn(ex).size +
      " reusedExchange nodes: " + "ReusedExchange".r.findAllIn(ex).size)
    spark.stop()
  }
}
