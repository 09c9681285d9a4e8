package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** X4i — BM25 ranked retrieval over the document corpus: the scoring
  * function behind keyword search / candidate retrieval in a RAG or
  * contamination-audit pipeline, expressed as pure aggregations (no search
  * library, no per-query index structure).
  *
  * BM25(d, Q) = Σ_{t∈Q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * with the standard Robertson idf = ln((N − df + ½)/(df + ½) + 1),
  * k1 = 1.2, b = 0.75.
  *
  * Scale: term frequencies for the (tiny, constant) query term set come
  * from ONE filtered scan + hash agg — the `isin` filter prunes the token
  * stream before any shuffle, so the exchanged relation is O(matching
  * docs·|Q|), never O(corpus tokens). Corpus stats (N, avgdl) are a
  * single-row aggregate broadcast onto the scored rows (the accepted
  * single-row-BNLJ class, see RegistrySpec), df is a |Q|-row broadcast.
  * Global top-k goes through TakeOrderedAndProject, not a full sort.
  *
  * Determinism: ln is libm — scores are rounded at 5 places and ranked ON
  * the rounded value with a doc_id tie-break (ROUNDLOG round-1 rules); the
  * arithmetic is written token-for-token identically in both engines so
  * IEEE evaluation matches bit-for-bit before the round.
  */
object RetrievalQueries {

  /** The fixed keyword query. Constant-size by construction — a batch of
    * queries would broadcast a (query_id, term) relation instead. */
  private val QUERY = Seq("vector", "spark", "window")
  private val TOP_K = 20

  def textBm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // doc lengths for every doc (BM25 normalizes by corpus-wide avgdl)
    val dl = docs.select($"doc_id", size(split($"text", " ")).cast(LongType).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum($"dl").cast(DoubleType) / count(lit(1))).as("avgdl"))
    val tf = docs
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .filter($"tok".isin(QUERY: _*))
      .groupBy($"doc_id", $"tok")
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df_), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select($"doc_id",
        (log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5) + 1.0) *
          ($"tf" * 2.2) /
          ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / $"avgdl"))).as("c"))
      .groupBy($"doc_id")
      .agg(round(sum($"c"), 5).as("score"))
    // distributed top-k first (TakeOrderedAndProject), THEN rank: the
    // global-ordered window only ever sees TOP_K rows, not every scored doc
    val top = scored.orderBy($"score".desc, $"doc_id".asc).limit(TOP_K)
    val w = Window.orderBy($"score".desc, $"doc_id".asc)
    top.withColumn("rnk", row_number().over(w).cast(LongType))
      .select($"rnk", $"doc_id", $"score")
      .orderBy($"rnk")
  }

  val textBm25Sql: String =
    s"""WITH dl AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
       |  FROM dl),
       |tf AS (
       |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |    FROM documents)
       |  WHERE tok IN (${QUERY.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY 1, 2),
       |dfs AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT tf.doc_id,
       |    round(SUM(
       |      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
       |      (tf * 2.2) /
       |      (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))), 5) AS score
       |  FROM tf
       |  JOIN dfs USING (tok)
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1)
       |SELECT rnk, doc_id, score FROM (
       |  SELECT doc_id, score, row_number() OVER (
       |    ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM scored)
       |WHERE rnk <= $TOP_K
       |ORDER BY rnk""".stripMargin

  // --- X4j: positional phrase search --------------------------------------

  /** Exact phrase matching (the quoted-query operator): for each fixed
    * two-word phrase, how many documents contain it and how many times,
    * counting overlapping occurrences. Positions never leave the row: the
    * per-doc count is a codegen array-HOF scan over adjacent token pairs —
    * no positional posting list is materialized, no join happens. The
    * corpus-level rollup is a hash agg onto |phrases| rows.
    *
    * At 100 TB this is the narrow-scan form a phrase filter should take
    * when it runs AFTER a cheap candidate cut (e.g. the BM25 tier above or
    * a bigram bloom filter); materialized positional indexes only pay when
    * the same corpus serves many ad-hoc phrases. */
  private val PHRASES = Seq(("big", "data"), ("hash", "join"), ("window", "merge"))

  def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withToks = Tables.documents(s, dir)
      .withColumn("toks", split($"text", " "))
    // one occurrence-count column per phrase, all from the same scan
    val occCols = PHRASES.map { case (w1, w2) =>
      expr(s"size(filter(sequence(0, size(toks) - 2), " +
        s"i -> toks[i] = '$w1' AND toks[i + 1] = '$w2'))")
        .cast(LongType).as(s"occ_${w1}_$w2")
    }
    val occ = withToks.filter(size($"toks") >= 2)
      .select(($"doc_id" +: occCols): _*)
    val stacked = occ.select(explode(array(PHRASES.map { case (w1, w2) =>
      struct(lit(s"$w1 $w2").as("phrase"), col(s"occ_${w1}_$w2").as("n"))
    }: _*)).as("p"))
      .select($"p.phrase".as("phrase"), $"p.n".as("n"))
    stacked.groupBy($"phrase")
      .agg(sum(when($"n" > 0, 1L).otherwise(0L)).as("n_docs"),
        sum($"n").as("n_occurrences"))
      .orderBy($"phrase")
  }

  val phraseSearchSql: String = {
    val branches = PHRASES.map { case (w1, w2) =>
      s"""SELECT '$w1 $w2' AS phrase,
         |  CAST(len(list_filter(generate_series(1, len(ts) - 1),
         |    i -> ts[i] = '$w1' AND ts[i + 1] = '$w2')) AS BIGINT) AS n
         |FROM (SELECT string_split(text, ' ') AS ts FROM documents)
         |WHERE len(ts) >= 2""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH occ AS (
       |  $branches)
       |SELECT phrase,
       |  CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       |  CAST(SUM(n) AS BIGINT) AS n_occurrences
       |FROM occ GROUP BY phrase
       |ORDER BY phrase""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_text_bm25", textBm25, Some(textBm25Sql),
      "X4i BM25 ranked retrieval: filtered tf agg + broadcast corpus stats"),
    QueryDef("q_phrase_search", phraseSearch, Some(phraseSearchSql),
      "X4j overlapping phrase occurrence census via narrow array-HOF scan"))
}
