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
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(label)
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-50s ${ts.head}%7.2f ${ts(1)}%7.2f s")
    }

    val li = graft.Tables.lineitem(spark, dir)

    // --- q_profile_lineitem substages
    time("profile: full current")(
      graft.analytics.Profiler.profileLineitem(spark, dir))
    val cols = li.schema.fields.toSeq.filterNot(_.dataType.isInstanceOf[ArrayType])
    val strCols = cols.filter(_.dataType.isInstanceOf[StringType]).map(_.name)
    // A: current wide pass-1 (strings ride along -> SortAggregate)
    def minMaxStr(c: String, dt: DataType) = dt match {
      case DoubleType =>
        (min(col(c).cast(DecimalType(18, 2))).cast(StringType),
          max(col(c).cast(DecimalType(18, 2))).cast(StringType))
      case _: TimestampType | _: TimestampNTZType =>
        (unix_micros(min(col(c)).cast(TimestampType)).cast(StringType),
          unix_micros(max(col(c)).cast(TimestampType)).cast(StringType))
      case _ => (min(col(c)).cast(StringType), max(col(c)).cast(StringType))
    }
    val aggsAll = cols.flatMap { f =>
      val (mn, mx) = minMaxStr(f.name, f.dataType)
      Seq(count(col(f.name)).as(s"${f.name}__n"),
        count(lit(1)).minus(count(col(f.name))).as(s"${f.name}__nulls"),
        mn.as(s"${f.name}__min"), mx.as(s"${f.name}__max"))
    }
    time("profile A: wide agg w/ strings (current p1)")(
      li.agg(aggsAll.head, aggsAll.tail: _*))
    // B: wide pass-1 without string min/max (should be HashAggregate)
    val aggsNum = cols.flatMap { f =>
      val base = Seq(count(col(f.name)).as(s"${f.name}__n"),
        count(lit(1)).minus(count(col(f.name))).as(s"${f.name}__nulls"))
      if (strCols.contains(f.name)) base
      else {
        val (mn, mx) = minMaxStr(f.name, f.dataType)
        base ++ Seq(mn.as(s"${f.name}__min"), mx.as(s"${f.name}__max"))
      }
    }
    time("profile B: wide agg numeric-only minmax")(
      li.agg(aggsNum.head, aggsNum.tail: _*))
    // C: melt -> dedup (current p2)
    val nullL = lit(null).cast(LongType)
    val nullD = lit(null).cast(DoubleType)
    val nullS = lit(null).cast(StringType)
    val kvs = cols.map { f =>
      val (vl, vd, vs) = f.dataType match {
        case DoubleType => (nullL, col(f.name), nullS)
        case _: TimestampType | _: TimestampNTZType =>
          (unix_micros(col(f.name).cast(TimestampType)), nullD, nullS)
        case _: StringType => (nullL, nullD, col(f.name))
        case _: NumericType | _: BooleanType =>
          (col(f.name).cast(LongType), nullD, nullS)
        case _ => (nullL, nullD, col(f.name).cast(StringType))
      }
      struct(lit(f.name).as("c"), vl.as("vl"), vd.as("vd"), vs.as("vs"))
    }
    val melted = li.select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.c").as("col_name"),
        col("kv.vl").as("vl"), col("kv.vd").as("vd"), col("kv.vs").as("vs"))
      .where(col("vl").isNotNull || col("vd").isNotNull || col("vs").isNotNull)
    time("profile C: melt+dedup (current p2)")(
      melted.groupBy(col("col_name"), col("vl"), col("vd"), col("vs"))
        .agg(first(lit(1)))
        .groupBy(col("col_name")).agg(count(lit(1)).as("n_distinct")))
    // D: dedup once; distinct counts by hash agg; string min/max from the
    // string slice of the dictionary (tiny); pass1 = B
    val dict = melted
      .groupBy(col("col_name"), col("vl"), col("vd"), col("vs"))
      .agg(count(lit(1)).as("cnt"))
    val nDist = dict.groupBy(col("col_name")).agg(count(lit(1)).as("n_distinct"))
    val strMm = dict.where(col("vs").isNotNull)
      .groupBy(col("col_name"))
      .agg(min(col("vs")).as("smin"), max(col("vs")).as("smax"))
    time("profile D: dict + ndist + str minmax")(
      nDist.join(strMm, Seq("col_name"), "left"))
    spark.stop()
  }
}
