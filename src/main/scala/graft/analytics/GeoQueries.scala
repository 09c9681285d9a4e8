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

  /** DuckDB mirror bands on the x axis ONLY (|cx−sx| ≤ R ⇒ sx lives in
    * the probe's x-cell ±1 — a trivially-true 1-D interval fact), so the
    * thing the hash still independently pins is the Spark side's packed
    * 2-D 3×3 cover. The r19 sweep measured the fully-brute form at 51 s
    * of sf1 oracle wall (1.5e9 distance pairs); the 1-D band cuts the
    * candidate set ~7× with no shared 2-D bucketing logic. */
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
       |  FROM (SELECT ck, cx, cy, cx // $R + off AS bx
       |        FROM probes CROSS JOIN (VALUES (-1), (0), (1)) t(off)) p
       |  JOIN (SELECT sx, sy, sx // $R AS bx FROM sites) s USING (bx)
       |  WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= ${R * R}
       |  GROUP BY ck),
       |perp AS (
       |  SELECT COALESCE(m.n_within, 0) AS n_within,
       |    COALESCE(m.min_d2, 0) AS min_d2
       |  FROM probes p LEFT JOIN matched m ON p.ck = m.ck)
       |SELECT n_within, COUNT(*) AS n_customers,
       |  CAST(SUM(min_d2) AS BIGINT) AS sum_min_d2
       |FROM perp GROUP BY n_within ORDER BY n_within""".stripMargin

  // --- G5: grid-density clustering (DBSCAN on cells) ----------------------

  /** Density threshold: a cell is DENSE when it holds at least 2× the
    * mean occupancy of occupied cells — scale-FREE (an absolute MINPTS
    * makes every cell dense once the corpus outgrows it, collapsing the
    * clustering into one component; a relative bar keeps the dense set a
    * small, genuinely-above-background fraction at any sf). Compared by
    * integer cross-multiplication: n_pts · n_cells ≥ 2 · n_total. */
  private val DENSE_X = 2L

  /** Grid-density clustering — the scale-correct DBSCAN approximation:
    * instead of per-point ε-neighborhood queries (an all-pairs problem),
    * points hash into R-wide cells, cells with ≥ [[MINPTS]] points are
    * dense, and clusters are connected components of the dense-cell
    * 8-adjacency graph. Adjacency on the packed cell id is a pure integer
    * difference test (no wrap: the per-axis id bound exceeds the max
    * occupied row by 2), and the components come from the dedup tier's
    * bounded-round min-label propagation ([[graft.ext.DedupQueries]]) —
    * the same machinery, reused on a graph whose size is CELL-bounded,
    * not point-bounded. Isolated dense cells are singleton clusters.
    *
    * Scale: one corpus pass to cell counts; everything after runs on the
    * dense-cell table (≤ (M/R)² rows regardless of data size). Output is
    * the per-cluster census keyed by min member cell. */
  /** Base-16 polynomial over the first 5 hex chars of an md5 column —
    * a 20-bit uniform, exact in both engines (the XP7 idiom). The G4 LCG
    * scatter is a low-discrepancy LATTICE (sequential keys × multiplier):
    * fine for a radius join, useless for density clustering — no cell
    * ever exceeds ~the mean. md5 coordinates are genuinely Poisson. */
  private def hexPoly(col: String, fn: String): String =
    (1 to 5).map(i =>
      s"($fn('0123456789abcdef', substring($col, $i, 1)) - 1) * ${1L << (4 * (5 - i))}")
      .mkString(" + ")

  def geoDensityClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.customer(s, dir)
      .select(md5(concat(lit("gx_"), $"c_custkey".cast("string"))).as("hx"),
        md5(concat(lit("gy_"), $"c_custkey".cast("string"))).as("hy"))
      .select((expr(hexPoly("hx", "instr")) % M).as("cx"),
        (expr(hexPoly("hy", "instr")) % M).as("cy"))
      .select(expr(s"(cx div $R) * $CELLS + (cy div $R)").as("cell"))
      .groupBy($"cell").agg(count(lit(1)).as("n_pts"))
    val tot = broadcast(cells.agg(sum($"n_pts").as("n_total"),
      count(lit(1)).as("n_cells_tot")))
    val dense = cells.crossJoin(tot)
      .where($"n_pts" * $"n_cells_tot" >= lit(DENSE_X) * $"n_total")
      .select($"cell", $"n_pts")
    val nbr = dense.select($"cell")
      .withColumn("dxy", explode(typedLit(
        (for { dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0 }
          yield dx * CELLS + dy).toSeq)))
      .select($"cell", ($"cell" + $"dxy").as("ncell"))
    val pairs = nbr
      .join(dense.select($"cell".as("ncell")), Seq("ncell"), "left_semi")
      .where($"cell" < $"ncell")
      .select($"cell".as("doc_a"), $"ncell".as("doc_b"))
    val labels = graft.ext.DedupQueries.clusterLabels(s, pairs)
      .select($"src".as("cell"), $"lbl")
    dense.join(labels, Seq("cell"), "left")
      .select(coalesce($"lbl", $"cell").as("cluster_id"), $"n_pts")
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_cells"), sum($"n_pts").as("n_points"))
      .orderBy($"cluster_id")
  }

  /** DuckDB mirror: same dense cells, adjacency as packed-id differences
    * (CELLS−1, CELLS, CELLS+1, and 1 — the 8-neighborhood under a<b),
    * components via the recursive min-label reach of the dedup oracle. */
  val geoDensityClustersSql: String = {
    val offs = Seq(1L, CELLS - 1, CELLS, CELLS + 1).mkString(", ")
    s"""WITH RECURSIVE hs AS (
       |  SELECT md5('gx_' || CAST(c_custkey AS VARCHAR)) AS hx,
       |    md5('gy_' || CAST(c_custkey AS VARCHAR)) AS hy
       |  FROM customer),
       |pts AS (
       |  SELECT (${hexPoly("hx", "strpos")}) % $M AS cx,
       |    (${hexPoly("hy", "strpos")}) % $M AS cy
       |  FROM hs),
       |cells AS (
       |  SELECT (cx // $R) * $CELLS + (cy // $R) AS cell, COUNT(*) AS n_pts
       |  FROM pts GROUP BY 1),
       |dense AS (
       |  SELECT cell, n_pts FROM cells
       |  WHERE n_pts * (SELECT COUNT(*) FROM cells)
       |    >= $DENSE_X * (SELECT CAST(SUM(n_pts) AS BIGINT) FROM cells)),
       |fpairs AS (
       |  SELECT a.cell AS ca, b.cell AS cb
       |  FROM dense a JOIN dense b ON b.cell - a.cell IN ($offs)),
       |edges AS (
       |  SELECT ca AS src, cb AS dst FROM fpairs
       |  UNION ALL SELECT cb, ca FROM fpairs),
       |reach(src, lbl) AS (
       |  SELECT src, dst AS lbl FROM edges
       |  UNION
       |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src),
       |labels AS (
       |  SELECT src AS cell, LEAST(src, MIN(lbl)) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT COALESCE(l.cluster_id, d.cell) AS cluster_id,
       |  COUNT(*) AS n_cells, CAST(SUM(d.n_pts) AS BIGINT) AS n_points
       |FROM dense d LEFT JOIN labels l ON d.cell = l.cell
       |GROUP BY 1 ORDER BY cluster_id""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_geo_grid_join", geoGridJoin, Some(geoGridJoinSql),
      "G4 within-radius spatial join via grid-cell bucketing (equi-join, exact)"),
    QueryDef("q_geo_density", geoDensityClusters, Some(geoDensityClustersSql),
      "G5 grid-density clustering: dense cells + 8-adjacency components"))
}
