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

    names.foreach {
      case "simjoin-stages" =>
        // stage-wise cost attribution for q_simjoin_prefix
        import org.apache.spark.sql.functions._
        import graft.Tables
        
        val s = spark
        import s.implicits._
        val shArr = when(size(col("toks")) >= 3,
          expr("transform(sequence(0, size(toks) - 3), " +
            "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
          .otherwise(array(col("text")))
        val sh = Tables.documents(s, dir)
          .withColumn("toks", split($"text", " "))
          .select($"doc_id", explode(array_distinct(shArr)).as("sh"))
        time("sh explode+count")(sh.count())
        val df_ = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
        time("df_ agg")(df_.count())
        val docArr = sh.join(df_, "sh")
          .groupBy($"doc_id")
          .agg(sort_array(collect_list(struct($"df", $"sh"))).as("ranked"))
          .select($"doc_id", expr("transform(ranked, r -> r.sh)").as("arr"),
            size($"ranked").cast("long").as("n_sh"))
        time("docArr build")(docArr.count())
        val pre = docArr.select($"doc_id", explode(expr(
          "slice(arr, 1, size(arr) - (3 * size(arr) + 4) div 5 + 1)")).as("sh"))
        time("pre explode")(pre.count())
        val cand = pre.toDF("a_id", "sh")
          .join(pre.toDF("b_id", "sh"), Seq("sh"))
          .filter($"a_id" < $"b_id").select($"a_id", $"b_id").distinct()
        println(s"cand rows: ${time("cand join+distinct")(cand.count())}")
        val full = graft.ext.SimJoinQueries.simjoinPrefix(s, dir)
        time("full query")(full.queryExecution.toRdd.count())
      case "containjoin-stages" =>
        // stage-wise cost attribution for q_contain_join (r9 watch-item)
        import org.apache.spark.sql.functions._
        import graft.Tables
        val s = spark
        import s.implicits._
        val shArr2 = when(size(col("toks")) >= 3,
          expr("transform(sequence(0, size(toks) - 3), " +
            "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
          .otherwise(array(col("text")))
        val sh = Tables.documents(s, dir)
          .withColumn("toks", split($"text", " "))
          .select($"doc_id", explode(array_distinct(shArr2)).as("sh"))
        val df_ = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
        val docArr = sh.join(df_, "sh")
          .groupBy($"doc_id")
          .agg(sort_array(collect_list(struct($"df", $"sh"))).as("ranked"))
          .select($"doc_id", expr("transform(ranked, r -> r.sh)").as("arr"),
            size($"ranked").cast("long").as("n_sh"))
        time("docArr build")(docArr.count())
        val pre = docArr.select($"doc_id".as("a_id"), $"arr".as("arr_a"),
          $"n_sh".as("a_n"), explode(expr(
            "slice(arr, 1, size(arr) - (9 * size(arr) + 9) div 10 + 1)")).as("sh"))
        time("pre explode")(pre.count())
        val postings = sh.toDF("b_id", "sh")
        println(s"posting rows: ${time("postings count")(postings.count())}")
        val candHeavy = pre.join(postings, Seq("sh"))
          .filter($"a_id" =!= $"b_id")
          .select($"a_id", $"arr_a", $"a_n", $"b_id").distinct()
        println(s"cand rows (arrays through distinct): ${time("cand heavy")(candHeavy.count())}")
        val candLight = pre.select($"a_id", $"sh").join(postings, Seq("sh"))
          .filter($"a_id" =!= $"b_id")
          .select($"a_id", $"b_id").distinct()
        println(s"cand rows (ids-only distinct): ${time("cand light")(candLight.count())}")
        time("full query warm1")(graft.ext.SimJoinQueries
          .containJoin(s, dir).queryExecution.toRdd.count())
        time("full query warm2")(graft.ext.SimJoinQueries
          .containJoin(s, dir).queryExecution.toRdd.count())
      case "spanscrub-stages" =>
        // stage-wise cost attribution for q_span_scrub (round 18: the one
        // superlinear query at the 10x tier — 20x time at 10x data)
        import org.apache.spark.sql.functions._
        import graft.Tables
        val s = spark
        import s.implicits._
        val W = 3
        val spans = Tables.documents(s, dir)
          .select($"doc_id", $"source", split($"text", " ").as("w"))
          .withColumn("n_spans", expr(s"size(w) div $W"))
          .withColumn("spans", expr(
            s"""slice(transform(sequence(0L, n_spans),
               |  i -> array_join(slice(w, CAST(i * $W + 1 AS INT), $W), ' ')),
               |  1, CAST(n_spans AS INT))""".stripMargin))
          .withColumn("tail", expr(
            s"array_join(slice(w, CAST(n_spans * $W + 1 AS INT), " +
              s"size(w) - CAST(n_spans * $W AS INT)), ' ')"))
        time("spans build")(spans.queryExecution.toRdd.count())
        graft.plans.GraftExtensions.registerOn(s)
        val hot = graft.ext.PipelineQueries.hotSpans(spans, 3, 65536)
        time("hotSpans")(hot.queryExecution.toRdd.count())
        val probed = spans.crossJoin(broadcast(hot))
          .withColumn("kept", expr("filter(spans, x -> NOT sorted_contains(hot, x))"))
          .select($"source", size($"spans").as("ns"), size($"kept").as("nk"))
          .groupBy($"source").agg(sum($"ns"), sum($"nk"))
        time("probe only")(probed.queryExecution.toRdd.count())
        val reasm = spans.crossJoin(broadcast(hot))
          .withColumn("kept", expr("filter(spans, x -> NOT sorted_contains(hot, x))"))
          .withColumn("scrubbed", expr(
            "concat_ws(' ', nullif(array_join(kept, ' '), ''), nullif(tail, ''))"))
          .groupBy($"source")
          .agg(sum(length($"scrubbed")).as("chars_out"),
            sum(expr("CAST(conv(substring(md5(scrubbed), 1, 12), 16, 10) AS BIGINT)" +
              " % 1000000007")).as("scrub_sum"))
        time("probe+reassemble+md5")(reasm.queryExecution.toRdd.count())
        time("full query")(graft.ext.PipelineQueries
          .spanScrub(s, dir).queryExecution.toRdd.count())
        // variant: hot set COLLECTED once and embedded as a literal —
        // no crossJoin, probe against a constant
        val hotArr = time("collect hot")(
          hot.collect().head.getSeq[String](0).toArray)
        val withLit = spans
          .withColumn("hot_lit", typedLit(hotArr))
          .withColumn("kept", expr("filter(spans, x -> NOT sorted_contains(hot_lit, x))"))
          .select($"source", size($"spans").as("ns"), size($"kept").as("nk"))
          .groupBy($"source").agg(sum($"ns"), sum($"nk"))
        time("probe via literal")(withLit.queryExecution.toRdd.count())
      case "cc-rounds" =>
        Seq("q_entity_resolution", "q_dedup_clusters", "q_dedup_chain_drift",
          "q_geo_grid_join").foreach { n =>
          val fn = graft.SparkEntry.queries(n)
          fn(spark, dir).queryExecution.toRdd.count()
          println(s"$n lastCcIters=${graft.ext.DedupQueries.lastCcIters}")
        }
      case n if n.startsWith("explain:") =>
        // print the executed plan for any declared query
        val df = graft.SparkEntry.queries(n.stripPrefix("explain:"))(spark, dir)
        df.queryExecution.toRdd.count() // finalize AQE
        println(s"=== ${n.stripPrefix("explain:")} ===")
        println(df.queryExecution.executedPlan.toString)
      case n =>
        val fn = graft.SparkEntry.queries(n)
        time(s"$n cold")(fn(spark, dir).queryExecution.toRdd.count())
        time(s"$n warm")(fn(spark, dir).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
