package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** X2h — EXACT set-similarity self-join via prefix filtering (the
  * PPJoin/AllPairs family), the scale-correct way to find ALL document
  * pairs with Jaccard ≥ t without an all-pairs comparison and without the
  * (tunable, lossy) recall of LSH banding.
  *
  * Principle: order every doc's shingle set by GLOBAL rarity (document
  * frequency asc, shingle asc). If J(A,B) ≥ t, then A and B must share at
  * least one shingle inside their first `|X| − ⌈t·|X|⌉ + 1` ordered
  * shingles (else the ≥ ⌈t·|X|⌉ overlap the threshold implies cannot fit
  * in what remains). So candidate generation only equi-joins PREFIX
  * posting lists — and because prefixes hold each doc's RAREST shingles,
  * those posting lists are self-limiting: a high-DF shingle lands in a
  * doc's prefix only when the doc has almost nothing rarer. No cap is
  * needed for correctness (unlike the LSH tier) — the filter is exact,
  * zero false negatives. The worst case (a corpus of near-identical docs)
  * is quadratic in the OUTPUT, which no exact algorithm avoids.
  *
  * Plan: one exchange on `sh` for document frequencies, one window pass
  * on `doc_id` for prefix ranks, an equi-join of prefix postings for
  * candidates, then verification joins that touch only candidate pairs
  * (O(cand · |set|), never corpus²).
  *
  * Cross-engine determinism: the threshold test is integer cross-
  * multiplication (J ≥ 3/5 ⇔ 8·|∩| ≥ 3·(|A|+|B|)) — no float compare —
  * and ⌈t·n⌉ is computed as (3n+4) div 5, integer-exact in both engines.
  */
object SimJoinQueries {

  /** Jaccard threshold t = NUM/DEN = 0.6 (kept as a ratio: every
    * threshold comparison stays in integer arithmetic). */
  private val NUM = 3
  private val DEN = 5

  def simjoinPrefix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Tables.documents(s, dir)
      .withColumn("toks", split($"text", " "))
      .select($"doc_id", explode(array_distinct(DedupQueries.shingleArr)).as("sh"))
    // global shingle rarity — partial-agg count, scale-safe on hot shingles
    val df_ = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    // rarity-ordered position of each shingle within its doc; ties are
    // impossible (shingles are distinct per doc, so (df, sh) is unique)
    val w = Window.partitionBy($"doc_id").orderBy($"df".asc, $"sh".asc)
    val pre = sh.join(df_, "sh")
      .withColumn("p", row_number().over(w))
      .join(sizes, "doc_id")
      // prefix length n − ⌈t·n⌉ + 1, with ⌈3n/5⌉ = (3n+4) div 5
      .filter($"p" <= $"n_sh" - expr(s"($NUM * n_sh + ${DEN - 1}) div $DEN") + 1)
      .select($"doc_id", $"sh")
    // candidates: pairs sharing a prefix shingle (rare-first ⇒ short lists)
    val cand = pre.toDF("a_id", "sh")
      .join(pre.toDF("b_id", "sh"), Seq("sh"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id")
      .distinct()
    // verify candidates exactly: expand each pair by A's full shingle set,
    // equi-join B's — cost O(cand · |set|), local to the candidate set
    val inter = cand
      .join(sh.toDF("a_id", "sh"), "a_id")
      .join(sh.toDF("b_id", "sh"), Seq("b_id", "sh"))
      .groupBy($"a_id", $"b_id")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.toDF("a_id", "a_n"), "a_id")
      .join(sizes.toDF("b_id", "b_n"), "b_id")
      // J ≥ 3/5 ⇔ 5·i ≥ 3·(a+b−i) ⇔ 8·i ≥ 3·(a+b): integer-exact
      .filter($"n_inter" * (DEN + NUM) >= ($"a_n" + $"b_n") * NUM)
      .select($"a_id", $"b_id", $"n_inter",
        ($"a_n" + $"b_n" - $"n_inter").as("n_union"),
        ($"n_inter".cast(DoubleType) / ($"a_n" + $"b_n" - $"n_inter")).as("jaccard"))
      .orderBy($"a_id", $"b_id")
  }

  val simjoinPrefixSql: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, unnest(${DedupQueries.shinglesSql}) AS sh
       |  FROM documents),
       |dfs AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |pre AS (
       |  SELECT doc_id, sh FROM (
       |    SELECT s.doc_id, s.sh, z.n_sh,
       |      row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.sh) AS p
       |    FROM sh s JOIN dfs d USING (sh) JOIN sizes z USING (doc_id))
       |  WHERE p <= n_sh - (($NUM * n_sh + ${DEN - 1}) // $DEN) + 1),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM pre a JOIN pre b ON a.sh = b.sh AND a.doc_id < b.doc_id),
       |inter AS (
       |  SELECT c.a_id, c.b_id, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a_id
       |  JOIN sh sb ON sb.doc_id = c.b_id AND sb.sh = sa.sh
       |  GROUP BY 1, 2)
       |SELECT i.a_id, i.b_id, i.n_inter,
       |  za.n_sh + zb.n_sh - i.n_inter AS n_union,
       |  CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.a_id
       |JOIN sizes zb ON zb.doc_id = i.b_id
       |WHERE i.n_inter * ${DEN + NUM} >= (za.n_sh + zb.n_sh) * $NUM
       |ORDER BY a_id, b_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_simjoin_prefix", simjoinPrefix, Some(simjoinPrefixSql),
      "X2h exact Jaccard self-join via rarity-ordered prefix filtering"))
}
