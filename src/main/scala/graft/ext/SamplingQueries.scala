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

  /** The ONE split rule, exposed for compositions (X2n split-leakage
    * audits the near-dup graph against exactly this assignment): split
    * of the doc id column named by `c`. Spark Column + SQL forms kept
    * adjacent so they cannot drift. */
  private[ext] def splitOf(c: String): org.apache.spark.sql.Column = {
    val h = substring(md5(col(c).cast("string")), 1, 1)
    when(h.isin("0", "1"), "val")
      .when(h.isin("2", "3"), "test")
      .otherwise("train")
  }

  private[ext] def splitSqlOf(c: String): String =
    s"""CASE WHEN substring(md5(CAST($c AS VARCHAR)), 1, 1) IN ('0','1') THEN 'val'
       |     WHEN substring(md5(CAST($c AS VARCHAR)), 1, 1) IN ('2','3') THEN 'test'
       |     ELSE 'train' END""".stripMargin

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

  // --- XP12: class-balanced downsampling ----------------------------------

  /** Balance the corpus to the SMALLEST class: every language keeps
    * exactly min-class-count documents, chosen by md5 rank (the
    * deterministic draw of the split/stratified tier) — the undersampling
    * complement of XP2's oversampling mixture (XP2 replicates small
    * classes up to a budget; this cuts large classes down to the floor).
    * Output audits per-language kept counts (all equal by construction)
    * and the surviving char mass.
    *
    * Scale: one count aggregate, one single-row min broadcast (the
    * bounded-BNLJ class), one hash-partitioned rank window, one census. */
  def sampleBalanced(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"lang", $"n_chars")
    val minc = broadcast(docs.groupBy($"lang").agg(count(lit(1)).as("cnt"))
      .agg(min($"cnt").as("minc")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
      .orderBy(md5(concat(lit("bal_"), $"doc_id".cast("string"))).asc,
        $"doc_id".asc)
    docs.withColumn("rn", row_number().over(w))
      .crossJoin(minc)
      .where($"rn" <= $"minc")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("sum_chars"))
      .orderBy($"lang")
  }

  val sampleBalancedSql: String =
    """WITH counts AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1),
      |ranked AS (
      |  SELECT doc_id, lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY
      |      md5('bal_' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_kept,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM ranked WHERE rn <= (SELECT MIN(cnt) FROM counts)
      |GROUP BY 1 ORDER BY lang""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_sample_balanced", sampleBalanced, Some(sampleBalancedSql),
      "XP12 class-balanced undersampling to the min class, md5-ranked draw"),
    QueryDef("q_sample_split", sampleSplit, Some(sampleSplitSql),
      "deterministic md5-keyed train/val/test split audit"),
    QueryDef("q_sample_stratified", sampleStratified, Some(sampleStratifiedSql),
      "deterministic stratified 1/8 sample per language"),
    QueryDef("q_sample_neyman", sampleNeyman, Some(sampleNeymanSql),
      "XP10 Neyman-allocated stratified sample: integer-exact allocation"))

  /** Total sample budget for the Neyman allocation. */
  private val BUDGET = 1000L

  // --- XP10: variance-proportional (Neyman) stratified sampling -----------

  /** Neyman allocation: when sampling a fixed budget across strata to
    * estimate a mean, the variance-optimal split gives stratum h
    * `n_h = budget · N_h·σ_h / Σ N·σ` — high-variance strata earn more
    * rows than proportional allocation would give. The eval-set builder's
    * sampler, computed end-to-end inside the engine.
    *
    * Determinism discipline: σ_h comes from exact integer sums (ST3's
    * sufficient statistics) but sqrt is libm, so σ is quantized to an
    * integer (round(σ·10⁴) as `sigma4`) and EVERYTHING downstream —
    * weights N·σ₄, the Σ-weight normalizer, the per-stratum allocation
    * `(budget · w) div Σw` — is 64-bit integer arithmetic: the
    * allocation is bit-exact in both engines, no float ever crosses a
    * floor boundary. The draw itself is the md5-ranked deterministic
    * take (this module's house key), so the SAMPLE is reproducible too.
    *
    * Scale: one stats pass (hash agg), a single-row Σw broadcast (the
    * accepted 1-row-BNLJ class), a 5-row allocation broadcast onto the
    * ranked take's one window pass. */
  def sampleNeyman(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", $"event_id",
        expr("cast(round(value * 100) as bigint)").as("cents"))
    val stats = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n_total"), sum($"cents").as("s1"),
        sum($"cents" * $"cents").as("s2"))
      .select($"event_type", $"n_total",
        round(sqrt(($"s2".cast("double") -
          $"s1".cast("double") * $"s1".cast("double") / $"n_total") /
          ($"n_total" - 1)) * 10000).cast("long").as("sigma4"))
      .withColumn("w", $"n_total" * $"sigma4")
    val totW = stats.agg(sum($"w").as("tot_w"))
    val alloc = stats.crossJoin(broadcast(totW))
      .select($"event_type", $"n_total", $"sigma4",
        expr(s"($BUDGET * w) div tot_w").as("alloc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
      .orderBy(md5($"event_id".cast("string")), $"event_id")
    ev.join(broadcast(alloc), "event_type")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= $"alloc")
      .groupBy($"event_type", $"n_total", $"sigma4", $"alloc")
      .agg(count(lit(1)).as("n_taken"), sum($"event_id").as("sum_sampled_ids"))
      .orderBy($"event_type")
  }

  val sampleNeymanSql: String =
    s"""WITH ev AS (
       |  SELECT event_type, event_id,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |stats AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
       |    CAST(round(sqrt((CAST(SUM(cents * cents) AS DOUBLE)
       |      - CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE)
       |        / COUNT(*)) / (COUNT(*) - 1)) * 10000) AS BIGINT) AS sigma4
       |  FROM ev GROUP BY 1),
       |weighted AS (SELECT *, n_total * sigma4 AS w FROM stats),
       |alloc AS (
       |  SELECT event_type, n_total, sigma4,
       |    CAST(($BUDGET * w) // (SELECT SUM(w) FROM weighted) AS BIGINT) AS alloc
       |  FROM weighted),
       |ranked AS (
       |  SELECT ev.event_type, ev.event_id, a.n_total, a.sigma4, a.alloc,
       |    row_number() OVER (PARTITION BY ev.event_type
       |      ORDER BY md5(CAST(ev.event_id AS VARCHAR)), ev.event_id) AS rn
       |  FROM ev JOIN alloc a USING (event_type))
       |SELECT event_type, n_total, sigma4, alloc,
       |  CAST(COUNT(*) AS BIGINT) AS n_taken,
       |  CAST(SUM(event_id) AS BIGINT) AS sum_sampled_ids
       |FROM ranked WHERE rn <= alloc
       |GROUP BY 1, 2, 3, 4
       |ORDER BY event_type""".stripMargin
}
