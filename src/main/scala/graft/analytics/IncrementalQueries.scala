package graft.analytics

import graft.{Ops, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental-maintenance and journey-analytics operators over the event
  * stream.
  */
object IncrementalQueries {

  // --- M4: incremental aggregate maintenance ----------------------------

  /** The 100-TB answer to "recompute the dashboard": maintain the standing
    * aggregate incrementally. The pre-cutoff partial stands in for the
    * materialized aggregate of every prior load; the post-cutoff partial is
    * today's delta; merging them is pure partial-aggregate algebra
    * (count→sum, sum→sum, min→min, max→max — the same merge contract
    * Spark's own partial aggregation uses), so the merged result is exactly
    * the full recompute the oracle runs without ever touching historical
    * rows again. Money merges in DECIMAL so partial+merge is bit-identical
    * to the one-shot aggregation. */
  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = lit("2024-01-25").cast(TimestampType)
    val ev = Tables.events(s, dir)
      .select($"event_type", $"ts", Ops.money($"value").as("v"))
    def partial(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mnv"), max(col("v")).as("mxv"))
    val prior = partial(ev.where($"ts" < cutoff)) // standing materialized agg
    val delta = partial(ev.where($"ts" >= cutoff)) // today's load
    prior.unionByName(delta)
      .groupBy($"event_type")
      .agg(
        sum($"n").as("n_events"),
        sum($"sv").cast(DoubleType).as("sum_value"),
        min($"mnv").cast(DoubleType).as("min_value"),
        max($"mxv").cast(DoubleType).as("max_value"))
      .orderBy($"event_type")
  }

  val incrementalAggSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
      |  CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
      |  CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  // --- W5: first/last-touch attribution ---------------------------------

  /** Marketing-style conversion attribution: each purchase credits the
    * user's first non-purchase touch ever and the last one before the
    * purchase, via two IGNORE-NULLS window aggregates over one shared
    * (user, time) frame — a single hash exchange on user_id, no self-join,
    * no per-user collect. Purchases with no prior touch attribute to
    * 'none' explicitly. */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val touch = when($"event_type" =!= "purchase", $"event_type")
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select($"user_id", $"event_type", Ops.epochUs($"ts").as("ts_us"),
        $"event_id", Ops.money($"value").as("v"))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .where($"event_type" === "purchase")
      .groupBy(
        coalesce($"first_touch", lit("none")).as("first_touch"),
        coalesce($"last_touch", lit("none")).as("last_touch"))
      .agg(count(lit(1)).as("n_purchases"),
        sum($"v").cast(DoubleType).as("sum_value"))
      .orderBy($"first_touch", $"last_touch")
  }

  val attributionSql: String =
    """WITH w AS (
      |  SELECT user_id, event_type, CAST(value AS DECIMAL(18,2)) AS v,
      |    FIRST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
      |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      |  FROM events)
      |SELECT COALESCE(first_touch, 'none') AS first_touch,
      |  COALESCE(last_touch, 'none') AS last_touch,
      |  COUNT(*) AS n_purchases, CAST(SUM(v) AS DOUBLE) AS sum_value
      |FROM w WHERE event_type = 'purchase'
      |GROUP BY 1, 2 ORDER BY first_touch, last_touch""".stripMargin

  // --- W5b: U-shaped multi-touch attribution ------------------------------

  /** Attribution lookback window: touches older than this never earn
    * credit (bounds the per-purchase expansion at any scale). */
  private[graft] val ATTR_WINDOW_US = 7L * 24 * 3600 * 1000000L

  /** POSITION-BASED (U-shaped) multi-touch attribution — the
    * industry-standard 40/20/40 split, in exact integer basis points:
    * each purchase credits every non-purchase touch in its 7-day
    * lookback — 40% to the first, 40% to the last, the middle 20% split
    * evenly (integer division; the remainder rides with the FIRST touch
    * so every purchase's credits sum to exactly 10000 bp — conservation
    * is spec-asserted). One touch takes 100%, two split 50/50, no touch
    * credits 'none'. Census per touch type: credit rows, total bp, and
    * credited cents (per-row `cents·bp div 10000`, truncation
    * documented).
    *
    * Scale: the purchase×touch expansion is an equi-join on user_id with
    * the window bound as a residual — per purchase it holds at most the
    * user's 7-day touch volume, never full history (the unbounded form
    * is quadratic per heavy user). The position windows partition by
    * purchase id over that bounded pair set. The no-touch case rides the
    * SAME left join (a null touch row), so the plan has no second pass
    * and no anti-join. */
  def attributionUTouch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_type", Ops.epochUs($"ts").as("ts_us"),
        $"event_id", expr("cast(round(value * 100) as bigint)").as("cents"))
    val purch = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_id"), $"ts_us".as("p_ts"),
        $"cents")
    val touch = e.filter($"event_type" =!= "purchase")
      .select($"user_id".as("t_user"), $"event_type".as("t_type"),
        $"ts_us".as("t_ts"), $"event_id".as("t_id"))
    val pairs = purch.join(touch,
      $"user_id" === $"t_user" && $"t_ts" < $"p_ts" &&
        $"t_ts" >= $"p_ts" - ATTR_WINDOW_US, "left")
    val byP = Window.partitionBy($"p_id")
    val wP = byP.orderBy($"t_ts".asc, $"t_id".asc)
    pairs
      .withColumn("rn", row_number().over(wP).cast("long"))
      .withColumn("cnt", count(lit(1)).over(byP))
      .withColumn("credit_bp", expr(
        """CASE WHEN t_type IS NULL THEN 10000
          |     WHEN cnt = 1 THEN 10000
          |     WHEN cnt = 2 THEN 5000
          |     WHEN rn = 1 THEN 4000 + 2000 % (cnt - 2)
          |     WHEN rn = cnt THEN 4000
          |     ELSE 2000 div (cnt - 2) END""".stripMargin))
      .groupBy(coalesce($"t_type", lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("n_credits"),
        sum($"credit_bp").as("bp_total"),
        sum(expr("cents * credit_bp div 10000")).as("credited_cents"))
      .orderBy($"touch_type")
  }

  val attributionUTouchSql: String =
    s"""WITH pe AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |pu AS (
       |  SELECT user_id, event_id AS p_id, ts_us AS p_ts, cents
       |  FROM pe WHERE event_type = 'purchase'),
       |tu AS (
       |  SELECT user_id AS t_user, event_type AS t_type, ts_us AS t_ts,
       |    event_id AS t_id
       |  FROM pe WHERE event_type <> 'purchase'),
       |pr AS (
       |  SELECT pu.*, tu.t_type, tu.t_ts, tu.t_id
       |  FROM pu LEFT JOIN tu ON pu.user_id = tu.t_user
       |    AND tu.t_ts < pu.p_ts
       |    AND tu.t_ts >= pu.p_ts - ${7L * 24 * 3600 * 1000000L}),
       |sc AS (
       |  SELECT *,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY p_id
       |      ORDER BY t_ts ASC, t_id ASC) AS BIGINT) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY p_id) AS BIGINT) AS cnt
       |  FROM pr),
       |cr AS (
       |  SELECT COALESCE(t_type, 'none') AS touch_type, cents,
       |    CASE WHEN t_type IS NULL THEN 10000
       |         WHEN cnt = 1 THEN 10000
       |         WHEN cnt = 2 THEN 5000
       |         WHEN rn = 1 THEN 4000 + 2000 % (cnt - 2)
       |         WHEN rn = cnt THEN 4000
       |         ELSE 2000 // (cnt - 2) END AS credit_bp
       |  FROM sc)
       |SELECT touch_type, COUNT(*) AS n_credits,
       |  CAST(SUM(credit_bp) AS BIGINT) AS bp_total,
       |  CAST(SUM(cents * credit_bp // 10000) AS BIGINT) AS credited_cents
       |FROM cr GROUP BY 1 ORDER BY touch_type""".stripMargin

  // --- M5: snapshot diff (CDC without a changelog) ----------------------

  /** Change-data-capture by snapshot comparison: given a keyed state table
    * at two points in time (per-customer latest order as-of 1996-01-01 vs
    * as-of end-of-data), classify every key as `added`, `changed`, or
    * `unchanged`, and roll the classes up with exact money totals. This is
    * the diff a warehouse computes when the upstream publishes full
    * snapshots instead of a changelog — the complement of M2's MERGE,
    * which CONSUMES a changelog.
    *
    * Scale: each snapshot is one window pass over orders (latest row per
    * customer — the W1 idiom), then ONE full-outer equi-join on the key and
    * a constant-size rollup. Both window passes and the join shuffle on the
    * same key (o_custkey), so AQE reuses the partitioning; nothing is
    * quadratic and no snapshot is collected to the driver. `removed` cannot
    * occur here (order history is append-only) but the classifier handles
    * it, and the spec pins the class partition property. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = lit("1996-01-01").cast(TimestampType)
    def latest(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey").as("custkey"), col("o_orderkey").as("okey"),
          col("o_orderstatus").as("st"), Ops.money(col("o_totalprice")).as("price"))
    }
    val orders = Tables.orders(s, dir)
    val old = latest(orders.filter($"o_orderdate" < cutoff))
      .toDF("custkey", "o_okey", "o_st", "o_price")
    val nw = latest(orders)
    val classified = nw.join(old, Seq("custkey"), "full_outer")
      .select($"custkey", $"okey", $"price",
        when($"okey".isNull, lit("removed"))
          .when($"o_okey".isNull, lit("added"))
          .when($"okey" === $"o_okey" && $"st" === $"o_st", lit("unchanged"))
          .otherwise(lit("changed")).as("class"))
    classified.groupBy($"class")
      .agg(count(lit(1)).as("n_keys"),
        sum($"price").cast(DoubleType).as("sum_price"))
      .orderBy($"class")
  }

  val snapshotDiffSql: String =
    """WITH old AS (
      |  SELECT * FROM (
      |    SELECT o_custkey AS custkey, o_orderkey AS o_okey,
      |      o_orderstatus AS o_st,
      |      row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |    FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01')
      |  WHERE rn = 1),
      |nw AS (
      |  SELECT * FROM (
      |    SELECT o_custkey AS custkey, o_orderkey AS okey,
      |      o_orderstatus AS st,
      |      CAST(o_totalprice AS DECIMAL(18,2)) AS price,
      |      row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |    FROM orders)
      |  WHERE rn = 1),
      |classified AS (
      |  SELECT COALESCE(n.custkey, o.custkey) AS custkey, n.price,
      |    CASE WHEN n.okey IS NULL THEN 'removed'
      |         WHEN o.o_okey IS NULL THEN 'added'
      |         WHEN n.okey = o.o_okey AND n.st = o.o_st THEN 'unchanged'
      |         ELSE 'changed' END AS class
      |  FROM nw n FULL OUTER JOIN old o ON n.custkey = o.custkey)
      |SELECT class, COUNT(*) AS n_keys,
      |  CAST(SUM(price) AS DOUBLE) AS sum_price
      |FROM classified GROUP BY class
      |ORDER BY class""".stripMargin

  // --- M9: incremental JOIN-view maintenance -----------------------------

  /** Incremental maintenance of a JOIN view — the general IVM identity
    * [[incrementalAgg]]'s append-only aggregate doesn't need: when BOTH
    * sides of V = A ⋈ B receive deltas, the view's delta is the
    * three-term expansion ΔV = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB, and the new view
    * is V₀ ∪ ΔV. This query materializes all four disjoint terms
    * (old⋈old standing state, the three delta terms) as partial
    * aggregates and MERGES them; the oracle is the one-shot full join —
    * a missing or double-counted term breaks the hash, so the identity
    * itself is what's pinned. Measures are mergeable only (counts +
    * DECIMAL sums — a distinct would straddle terms).
    *
    * Scale: the standing old⋈old term is the materialized view (never
    * recomputed — here derived for the proof); daily work is the three
    * Δ-proportional joins, each a key-partitioned equi-join where the
    * Δ side prunes the probe. The merge is partial-aggregate algebra,
    * the same contract Spark's own two-phase aggregation uses. */
  def incrementalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val oCut = lit("1998-01-01").cast(TimestampType)
    val lCut = lit("1999-01-01").cast(TimestampType)
    val o = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderdate")
    val l = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_returnflag", $"l_shipdate",
        Ops.money($"l_extendedprice").as("price"))
    val (o0, dO) = (o.where($"o_orderdate" < oCut), o.where($"o_orderdate" >= oCut))
    val (l0, dL) = (l.where($"l_shipdate" < lCut), l.where($"l_shipdate" >= lCut))
    def term(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, $"o_orderkey" === $"l_orderkey")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), sum($"price").as("sp"))
    Seq(term(o0, l0), term(dO, l0), term(o0, dL), term(dO, dL))
      .reduce(_.unionByName(_))
      .groupBy($"l_returnflag")
      .agg(sum($"n").as("n_rows"),
        sum($"sp").cast(DoubleType).as("sum_price"))
      .orderBy($"l_returnflag")
  }

  val incrementalJoinSql: String =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
      |    AS sum_price
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_incremental_join", incrementalJoin, Some(incrementalJoinSql),
      "M9 incremental JOIN-view maintenance: three-term delta expansion merged, pinned to the one-shot join"),
    QueryDef("q_snapshot_diff", snapshotDiff, Some(snapshotDiffSql),
      "M5 CDC snapshot diff: two latest-state windows + one full-outer join"),
    QueryDef("q_incremental_agg", incrementalAgg, Some(incrementalAggSql),
      "M4 incremental aggregate maintenance: partial merge == full recompute"),
    QueryDef("q_attribution", attribution, Some(attributionSql),
      "W5 first/last-touch purchase attribution via IGNORE NULLS windows"),
    QueryDef("q_attribution_utouch", attributionUTouch,
      Some(attributionUTouchSql),
      "W5b U-shaped multi-touch attribution: 40/20/40 integer-bp credit over the 7-day lookback, conservation-exact"))
}
