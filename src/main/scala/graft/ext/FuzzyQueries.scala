package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate string matching — the edit-distance tier of the dedup
  * family (X2 handles token-set similarity; this handles typo-level
  * variation in short keys like product names, brands, entity labels).
  */
object FuzzyQueries {

  /** Fuzzy self-join of the part-name dictionary: name pairs within
    * Levenshtein distance 3, blocked on (first char, |length delta| ≤ 3).
    *
    * The 100-TB shape is dictionary-space, not row-space: distinct names
    * are extracted first (an aggregate that also carries each name's row
    * support), the quadratic candidate generation runs over the TINY
    * dictionary under a blocking predicate, and row-level consumers would
    * join back by exact name. Edit distance never touches the fact table.
    * Blocking note: first-char equality is demo-grade (a first-char typo
    * escapes the block); production blocking would OR a few cheap keys
    * (prefix, suffix, length bucket) the same way. */
  def fuzzyNameJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = Tables.part(s, dir)
      .groupBy($"p_name").agg(count(lit(1)).as("n_parts"))
    val a = names.select($"p_name".as("name_a"), $"n_parts".as("parts_a"))
    val b = names.select($"p_name".as("name_b"), $"n_parts".as("parts_b"))
    a.join(b,
        substring($"name_a", 1, 1) === substring($"name_b", 1, 1) &&
          abs(length($"name_a") - length($"name_b")) <= 3 &&
          $"name_a" < $"name_b")
      .withColumn("dist", levenshtein($"name_a", $"name_b").cast("long"))
      .where($"dist" <= 3)
      .select($"name_a", $"name_b", $"dist", $"parts_a", $"parts_b")
      .orderBy($"name_a", $"name_b")
  }

  val fuzzyNameJoinSql: String =
    """WITH names AS (
      |  SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY 1)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
      |  a.n_parts AS parts_a, b.n_parts AS parts_b
      |FROM names a JOIN names b
      |  ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
      | AND abs(len(a.p_name) - len(b.p_name)) <= 3
      | AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3
      |ORDER BY name_a, name_b""".stripMargin

  /** Transposition-tolerant twin of [[fuzzyNameJoin]]: the same
    * dictionary-space blocked self-join scored by Jaro-Winkler instead of
    * Levenshtein — the scorer entity-resolution uses for short name keys,
    * where a swapped word pair costs Levenshtein heavily but barely dents
    * JW. Spark has no built-in Jaro-Winkler; this drives the custom codegen
    * [[graft.functions.JaroWinkler]] expression, whose semantics are pinned
    * byte-for-byte to DuckDB's `jaro_winkler_similarity` (the oracle).
    *
    * Determinism: JW is pure double arithmetic (no libm) but its summation
    * shape differs between engines, so the score is rounded at 5 places and
    * BOTH the threshold filter and the output use the rounded value. */
  def fuzzyJaroWinkler(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = Tables.part(s, dir)
      .groupBy($"p_name").agg(count(lit(1)).as("n_parts"))
    val a = names.select($"p_name".as("name_a"), $"n_parts".as("parts_a"))
    val b = names.select($"p_name".as("name_b"), $"n_parts".as("parts_b"))
    a.join(b,
        substring($"name_a", 1, 1) === substring($"name_b", 1, 1) &&
          $"name_a" < $"name_b")
      .withColumn("jw",
        round(graft.functions.JaroWinkler.jaroWinkler($"name_a", $"name_b"), 5))
      .where($"jw" >= 0.85)
      .select($"name_a", $"name_b", $"jw", $"parts_a", $"parts_b")
      .orderBy($"name_a", $"name_b")
  }

  val fuzzyJaroWinklerSql: String =
    """WITH names AS (
      |  SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY 1)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  round(jaro_winkler_similarity(a.p_name, b.p_name), 5) AS jw,
      |  a.n_parts AS parts_a, b.n_parts AS parts_b
      |FROM names a JOIN names b
      |  ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
      | AND a.p_name < b.p_name
      |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 5) >= 0.85
      |ORDER BY name_a, name_b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_fuzzy_name_join", fuzzyNameJoin, Some(fuzzyNameJoinSql),
      "X2e dictionary-space fuzzy join: blocked Levenshtein name pairs"),
    QueryDef("q_fuzzy_jarowinkler", fuzzyJaroWinkler, Some(fuzzyJaroWinklerSql),
      "X2e' blocked Jaro-Winkler name pairs via custom codegen expression"))
}
