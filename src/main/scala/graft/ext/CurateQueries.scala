package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The composed curation pipeline — the query a 100-TB training-data run
  * actually materializes: every document attributed to its FIRST failing
  * stage of quality filter → exact dedup → near-dup dedup, rolled up per
  * (lang, source).
  *
  * Stage semantics (deterministic):
  *  1. low_quality — fails [[TextQueries.qualityCol]] (Gopher/C4 rule
  *     family).
  *  2. exact_dup — among quality-passing docs sharing a sha256(text),
  *     every doc but the smallest doc_id.
  *  3. near_dup — a non-canonical member of an LSH cluster
  *     ([[DedupQueries]] cluster table, canonical = longest text / min
  *     doc_id, defined on the FULL corpus: the cluster table is computed
  *     once upstream of the filter stages, as a real pipeline does).
  *  4. kept — survives all three.
  *
  * Scale shape: ONE pass of the corpus computes the quality flag and
  * content hash, ONE hash-partitioned window ranks exact duplicates
  * (sorting quality-passing docs first, so a q-doc's rank counts only
  * q-docs — no self-join back onto the scan), one join against the
  * memoized cluster table, one final aggregate.
  */
object CurateQueries {

  def curate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"source",
        size(split($"text", " ")).cast(LongType).as("token_cnt"),
        TextQueries.qualityCol.as("q"),
        sha2($"text", 256).as("h"))
    // exact-dup rank: quality-passing docs sort first within a content
    // hash, so for a q-doc, xrn = its rank among q-docs of that hash —
    // and xrn is only consulted when q is true
    val wExact = Window.partitionBy($"h").orderBy($"q".desc, $"doc_id".asc)
    val member = DedupQueries.rankedMembers(s, dir)
      .select($"doc_id", $"rn".as("crn"))
    val verdict = when(!$"q", "low_quality")
      .when($"xrn" > 1, "exact_dup")
      .when($"crn".isNotNull && $"crn" =!= 1, "near_dup")
      .otherwise("kept")
    base
      .withColumn("xrn", row_number().over(wExact))
      .join(member, Seq("doc_id"), "left")
      .withColumn("verdict", verdict)
      .groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"verdict" === "low_quality", 1L).otherwise(0L)).as("n_lowq"),
        sum(when($"verdict" === "exact_dup", 1L).otherwise(0L)).as("n_exact_dup"),
        sum(when($"verdict" === "near_dup", 1L).otherwise(0L)).as("n_near_dup"),
        sum(when($"verdict" === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"verdict" === "kept", $"token_cnt").otherwise(0L))
          .as("kept_tokens"))
      .orderBy($"lang", $"source")
  }

  val curateSql: String =
    s"""WITH RECURSIVE ${DedupQueries.ccCtesSql},
       |base AS (
       |  SELECT doc_id, lang, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS token_cnt,
       |    ${TextQueries.qualityPredSql} AS q,
       |    sha256(text) AS h
       |  FROM documents),
       |xranked AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY h ORDER BY q DESC, doc_id ASC) AS xrn
       |  FROM base),
       |verdicts AS (
       |  SELECT b.lang, b.source, b.token_cnt,
       |    CASE WHEN NOT b.q THEN 'low_quality'
       |      WHEN b.xrn > 1 THEN 'exact_dup'
       |      WHEN r.rn IS NOT NULL AND r.rn <> 1 THEN 'near_dup'
       |      ELSE 'kept' END AS verdict
       |  FROM xranked b
       |  LEFT JOIN ranked r ON b.doc_id = r.doc_id)
       |SELECT lang, source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN verdict = 'low_quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_lowq,
       |  CAST(SUM(CASE WHEN verdict = 'exact_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
       |  CAST(SUM(CASE WHEN verdict = 'near_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
       |  CAST(SUM(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN verdict = 'kept' THEN token_cnt ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM verdicts GROUP BY lang, source ORDER BY lang, source""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_pipeline_curate", curate, Some(curateSql),
      "composed curation pipeline: quality -> exact dedup -> near-dup, stage-attributed"))
}
