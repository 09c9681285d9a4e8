package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial join operators (G tier). The scalar geo suite (Haversine with
  * its bounding-box optimizer rule) lives in [[graft.functions.Haversine]];
  * this module adds the JOIN-shaped spatial operator: all reference sites
  * within radius R of each probe point, computed with grid-cell bucketing
  * so the join is an equi-join on cell id — never a cross join with a
  * distance predicate (which Spark would execute as a cartesian/BNLJ and
  * which dies at any scale).
  *
  * Point sets are derived deterministically from table keys via integer
  * LCG scatter over a 1,000,000² grid (pure BIGINT arithmetic — identical
  * in Spark and DuckDB, no float trig, no hex parsing). Distances are
  * integer squared Euclidean, so every comparison is exact.
  */
object GeoQueries {

  private val M = 1000000L        // grid domain per axis
  private val R = 50000L          // radius = cell width (5% of domain)
  private val CELLS = M / R + 2   // per-axis cell-id bound for packing

  /** G4: within-radius spatial join probes (customers) against sites
    * (suppliers). Cell side length equals R, so every site within R of a
    * probe lies in the probe's 3×3 cell neighborhood: the probe side
    * explodes 9 candidate cells, the join is a plain equi-join on the
    * packed cell id, and the exact integer d² ≤ R² filter runs on the
    * candidates. Each site lives in exactly one cell, so no pair is seen
    * twice and no dedup pass is needed. Output is the match-count
    * histogram with the exact sum of nearest-site distances² per bucket
    * (zero-match probes kept via one left join back to probes).
    *
    * Scale: candidates per probe = sites in 9 cells ≈ 9·|S|·R²/M² —
    * density-bounded, not |S|-bounded; the shuffle key is the cell id and
    * the LCG scatter keeps it skew-free. At 100 TB the same plan holds
    * with R tuned so cell occupancy stays O(1) per reducer. */
  def geoGridJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probes = Tables.customer(s, dir).select(
      $"c_custkey".as("ck"),
      (($"c_custkey" * 48271L + 11L) % M).as("cx"),
      (($"c_custkey" * 69621L + 7L) % M).as("cy"))
    val sites = Tables.supplier(s, dir).select(
      $"s_suppkey".as("sk"),
      (($"s_suppkey" * 16807L + 3L) % M).as("sx"),
      (($"s_suppkey" * 37333L + 5L) % M).as("sy"))
    val sCells = sites.withColumn("cell",
      expr(s"(sx div $R) * $CELLS + (sy div $R)"))
    val pCells = probes
      .withColumn("dxy", explode(typedLit(
        (for { dx <- -1 to 1; dy <- -1 to 1 } yield dx * CELLS + dy).toSeq)))
      .withColumn("cell",
        expr(s"(cx div $R) * $CELLS + (cy div $R)") + $"dxy")
    val matched = pCells.join(sCells, Seq("cell"))
      .where(($"cx" - $"sx") * ($"cx" - $"sx") +
        ($"cy" - $"sy") * ($"cy" - $"sy") <= R * R)
      .groupBy($"ck")
      .agg(count(lit(1)).as("n_within"),
        min(($"cx" - $"sx") * ($"cx" - $"sx") +
          ($"cy" - $"sy") * ($"cy" - $"sy")).as("min_d2"))
    probes.join(matched, Seq("ck"), "left")
      .select(coalesce($"n_within", lit(0L)).as("n_within"),
        coalesce($"min_d2", lit(0L)).as("min_d2"))
      .groupBy($"n_within")
      .agg(count(lit(1)).as("n_customers"), sum($"min_d2").as("sum_min_d2"))
      .orderBy($"n_within")
  }

  /** DuckDB mirror is the brute-force distance join — the grid bucketing
    * must be invisible in the result (exactness of the 3×3 cover is the
    * thing the hash pins). */
  val geoGridJoinSql: String =
    s"""WITH probes AS (
       |  SELECT c_custkey AS ck,
       |    (c_custkey * 48271 + 11) % $M AS cx,
       |    (c_custkey * 69621 + 7) % $M AS cy
       |  FROM customer),
       |sites AS (
       |  SELECT s_suppkey AS sk,
       |    (s_suppkey * 16807 + 3) % $M AS sx,
       |    (s_suppkey * 37333 + 5) % $M AS sy
       |  FROM supplier),
       |matched AS (
       |  SELECT ck, COUNT(*) AS n_within,
       |    MIN((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)) AS min_d2
       |  FROM probes JOIN sites
       |    ON (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= ${R * R}
       |  GROUP BY ck),
       |perp AS (
       |  SELECT COALESCE(m.n_within, 0) AS n_within,
       |    COALESCE(m.min_d2, 0) AS min_d2
       |  FROM probes p LEFT JOIN matched m ON p.ck = m.ck)
       |SELECT n_within, COUNT(*) AS n_customers,
       |  CAST(SUM(min_d2) AS BIGINT) AS sum_min_d2
       |FROM perp GROUP BY n_within ORDER BY n_within""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_geo_grid_join", geoGridJoin, Some(geoGridJoinSql),
      "G4 within-radius spatial join via grid-cell bucketing (equi-join, exact)"))
}
