package graft.analytics

import graft.{Ops, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators: slowly-changing-dimension interval
  * building, MERGE-style upsert reconciliation, and semi-structured
  * VARIANT extraction — the table-maintenance surface of the engine
  * (the batch complements of the streaming latest-state upsert in
  * [[graft.streaming.StreamJobs]]).
  */
object WarehouseQueries {

  // --- M1: SCD Type-2 interval build ------------------------------------

  /** Build SCD Type-2 validity intervals from the event stream: per user,
    * each run of a repeated state (event_type) collapses to one interval
    * [valid_from, valid_to), open intervals are "current". Emitted as the
    * per-state audit aggregate (interval counts, open rows, closed
    * duration) so the result is compact at any scale.
    *
    * Scale: both windows share one hash partitioning on user_id (single
    * exchange); the change-detection filter drops repeated states BEFORE
    * the second window, so interval rows are bounded by state changes,
    * not events. Ordering ties on (ts, event_id) so duplicate timestamps
    * cannot make the interval set nondeterministic. */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_type", Ops.epochUs($"ts").as("ts_us"),
        $"event_id")
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val changes = ev
      .withColumn("prev", lag($"event_type", 1).over(w))
      .where($"prev".isNull || $"prev" =!= $"event_type")
    changes
      .withColumn("to_us", lead($"ts_us", 1).over(w))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(when($"to_us".isNull, 1L).otherwise(0L)).as("n_current"),
        sum(when($"to_us".isNotNull, $"to_us" - $"ts_us").otherwise(0L))
          .as("closed_dur_us"))
      .orderBy($"event_type")
  }

  val scd2IntervalsSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |changes AS (
      |  SELECT user_id, event_type, ts_us, event_id FROM ordered
      |  WHERE prev IS NULL OR prev <> event_type),
      |iv AS (
      |  SELECT user_id, event_type, ts_us,
      |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_us
      |  FROM changes)
      |SELECT event_type, COUNT(*) AS n_intervals,
      |  CAST(SUM(CASE WHEN to_us IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
      |  CAST(SUM(CASE WHEN to_us IS NOT NULL THEN to_us - ts_us ELSE 0 END) AS BIGINT)
      |    AS closed_dur_us
      |FROM iv GROUP BY 1 ORDER BY event_type""".stripMargin

  // --- M2: MERGE-style upsert reconciliation ----------------------------

  /** Batch MERGE INTO semantics expressed as one full-outer join: a staged
    * delta (price revisions for every 7th order + net-new orders derived
    * from every 13th key) reconciles against the base table, and each row
    * is classified insert / update / unchanged. Output is the per-status
    * action audit — what a warehouse MERGE reports as its row counts.
    *
    * Money stays in exact DECIMAL through the 5% revision and the sum;
    * cast to double only at the end (the [[graft.Ops]] contract).
    * Scale: one shuffle on the merge key; AQE broadcasts the delta when
    * it is small. No driver-side state. */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, dir)
      .select($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
        Ops.money($"o_totalprice").as("price"))
    val updates = base.where($"k" % 7 === 0)
      .select($"k", $"st",
        ($"price" * lit(new java.math.BigDecimal("1.05"))).as("price"))
    // Insert keys are offset past the ACTUAL max base key (broadcast 1-row
    // aggregate, not a constant): a fixed offset collides with real keys
    // once o_orderkey outgrows it (~sf 1.7 for 10M), silently reclassifying
    // inserts as updates. The +1 matters: base keys start at 0, so the
    // smallest synthetic key maxk + 0 would collide with the real max key.
    val maxKey = broadcast(base.agg(max($"k").as("maxk")))
    val inserts = base.where($"k" % 13 === 0).crossJoin(maxKey)
      .select(($"maxk" + $"k" + lit(1L)).as("k"), $"st", $"price")
    val delta = updates.unionByName(inserts)
      .select($"k".as("d_k"), $"st".as("d_st"), $"price".as("d_price"))
    base.join(delta, $"k" === $"d_k", "full_outer")
      .select(
        coalesce($"d_st", $"st").as("o_orderstatus"),
        when($"k".isNull, "insert")
          .when($"d_k".isNull, "unchanged")
          .otherwise("update").as("action"),
        coalesce($"d_price", $"price").as("fp"))
      .groupBy($"o_orderstatus", $"action")
      .agg(count(lit(1)).as("n_rows"),
        sum($"fp").cast("double").as("sum_price"))
      .orderBy($"o_orderstatus", $"action")
  }

  val mergeUpsertSql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders),
      |upd AS (
      |  SELECT k, st, price * CAST(1.05 AS DECIMAL(3,2)) AS price
      |  FROM base WHERE k % 7 = 0),
      |ins AS (
      |  SELECT (SELECT MAX(k) FROM base) + k + 1 AS k, st,
      |    CAST(price AS DECIMAL(21,4)) AS price
      |  FROM base WHERE k % 13 = 0),
      |delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
      |m AS (
      |  SELECT COALESCE(d.st, b.st) AS o_orderstatus,
      |    CASE WHEN b.k IS NULL THEN 'insert'
      |         WHEN d.k IS NULL THEN 'unchanged'
      |         ELSE 'update' END AS action,
      |    COALESCE(d.price, b.price) AS fp
      |  FROM base b FULL OUTER JOIN delta d ON b.k = d.k)
      |SELECT o_orderstatus, action, COUNT(*) AS n_rows,
      |  CAST(SUM(fp) AS DOUBLE) AS sum_price
      |FROM m GROUP BY 1, 2 ORDER BY o_orderstatus, action""".stripMargin

  // --- M3: VARIANT semi-structured extraction ---------------------------

  /** Spark 4 native VARIANT path over the events props JSON: parse once
    * into the binary variant encoding, extract a typed field, aggregate.
    * Functionally the twin of the string-path q_json_extract, but the
    * scan-side representation is the columnar variant binary (one parse,
    * typed access) rather than per-access string re-parsing — the shape
    * that matters when props is kilobytes and accessed several times.
    * Oracle: DuckDB JSON extraction of the same field. */
  def variantExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type",
        variant_get(parse_json($"props"), "$.k", "bigint").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"k").as("sum_k"), min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val variantExtractSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_scd2_intervals", scd2Intervals, Some(scd2IntervalsSql),
      "M1 SCD Type-2 validity intervals from a change stream"),
    QueryDef("q_merge_upsert", mergeUpsert, Some(mergeUpsertSql),
      "M2 MERGE-style upsert reconciliation via one full-outer join"),
    QueryDef("q_variant_extract", variantExtract, Some(variantExtractSql),
      "M3 Spark-4 VARIANT typed extraction over semi-structured props"))
}
