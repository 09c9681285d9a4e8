package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for a training-data
  * pipeline. Assignment is keyed on md5 of the stable row key — fully
  * reproducible across runs, engines, and cluster sizes (no RNG state, no
  * partition dependence), which is what makes a 100 TB split auditable.
  * The first hex char partitions rows into 16 equal-probability cells.
  */
object SamplingQueries {

  /** 16-cell hash bucket of the doc key, '0'..'f'. */
  private def cell = substring(md5(col("doc_id").cast("string")), 1, 1)

  /** Train/val/test split (12/2/2 cells ≈ 75/12.5/12.5%) with per-stratum
    * counts — the audit view of a dataset split. */
  def sampleSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val split = when(cell.isin("0", "1"), "val")
      .when(cell.isin("2", "3"), "test")
      .otherwise("train")
    Tables.documents(s, dir)
      .select($"lang", split.as("split"), $"n_chars")
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"lang", $"split")
  }

  val sampleSplitSql: String =
    """SELECT lang,
      |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1') THEN 'val'
      |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('2','3') THEN 'test'
      |       ELSE 'train' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  /** Deterministic 1/8 stratified sample: the sampled doc ids per language,
    * with the stratum's total for rate auditing. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(cell.isin("0", "1"), 1L).otherwise(0L)).as("n_sampled"),
        min(when(cell.isin("0", "1"), $"doc_id")).as("first_sampled_id"),
        max(when(cell.isin("0", "1"), $"doc_id")).as("last_sampled_id"))
      .orderBy($"lang")
  }

  val sampleStratifiedSql: String =
    """SELECT lang, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  MIN(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')
      |      THEN doc_id END) AS first_sampled_id,
      |  MAX(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')
      |      THEN doc_id END) AS last_sampled_id
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_sample_split", sampleSplit, Some(sampleSplitSql),
      "deterministic md5-keyed train/val/test split audit"),
    QueryDef("q_sample_stratified", sampleStratified, Some(sampleStratifiedSql),
      "deterministic stratified 1/8 sample per language"))
}
