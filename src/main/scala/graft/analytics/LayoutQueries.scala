package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout planning: the Z-order (Morton-curve) clustering primitive
  * behind lakehouse `OPTIMIZE ... ZORDER BY`, measured as a data-skipping
  * audit. The reference's layout story is one-dimensional (Hive-style
  * `load_date=` partitions, bucket_raw_data.py:85-93); multi-dimensional
  * predicates on such a layout scan everything. Z-ordering interleaves the
  * bits of several columns into one sort key so that FILE-LEVEL min/max
  * stats become selective on EVERY interleaved dimension at once — the
  * technique that turns "touch all files" into "touch a few" for a
  * 100-TB table queried by more than its partition column.
  *
  * Everything here is exact integer arithmetic (bit shifts, masks,
  * fixed-width key-space buckets), so the audit is bit-identical across
  * engines and cluster layouts — no sampled range boundaries, no RNG.
  */
object LayoutQueries {

  /** Bits kept of user_id (x) and of the day ordinal (y). */
  private val XBITS = 10
  private val YBITS = 5

  /** Fixed day-ordinal base (events are 2024-02/03, dayn 19723..19752);
    * a constant base keeps the key a pure per-row function — no global
    * min() pass, no coupling between rows. */
  private val DAY0 = 19723L

  /** Files = fixed-width key-space blocks of 2^7 keys: 15-bit keyspace /
    * 128 → ≤256 files. Fixed-width (vs equal-row ntile) keeps assignment
    * a narrow per-row expression — the oracle-safe, shuffle-free stand-in
    * for a writer's range partitioner. */
  private val FILE_SHIFT = 7

  /** Probe day for the skipping audit (y = 15, mid-range, present at
    * every SF). */
  private val PROBE_Y = 15L

  /** Morton interleave of x (XBITS wide) and y (YBITS wide), generated as
    * engine-specific SQL from the same bit map: y bit i → position 2i+1,
    * x bit i → position 2i for i < YBITS, then the remaining x bits pack
    * above the interleaved span. */
  private def zkeyTerms(shl: (String, Int) => String,
      bit: (String, Int) => String): String = {
    val lo = (0 until YBITS).flatMap { i =>
      Seq(shl(bit("x", i), 2 * i), shl(bit("y", i), 2 * i + 1))
    }
    val hi = (YBITS until XBITS).map { i => shl(bit("x", i), i + YBITS) }
    (lo ++ hi).mkString(" + ")
  }

  private def zkeySpark: String =
    zkeyTerms((e, p) => s"shiftleft($e, $p)",
      (c, i) => s"(shiftright($c, $i) & 1)")

  private def zkeyDuck: String =
    zkeyTerms((e, p) => s"(($e) << $p)", (c, i) => s"((($c) >> $i) & 1)")

  /** Per-layout skipping audit over events: lay rows out by (a) the
    * user-major linear key `x·2^YBITS + y` — the classic "partition by the
    * leading column" layout — and (b) the Morton key; cut both keyspaces
    * into fixed 2^FILE_SHIFT-wide files; collect per-file day min/max (the
    * stats a parquet footer carries); report, per layout, the file count,
    * the summed per-file day extent, and how many files a single-day probe
    * must touch. Z-order wins exactly when sum_day_span and probe_files
    * drop while n_files stays comparable — the measurable definition of
    * "clustered on both dimensions".
    *
    * Scale: ONE scan — each row explodes into its two (layout, file_id)
    * assignments (a codegen Generate, not a second pass over the table),
    * then one hash aggregate whose partial side collapses to ≤512
    * (layout, file) groups before the only exchange. The union-of-two-
    * aggregates alternative reads the fact table twice; at 100 TB the
    * scan dominates, so the explode shape halves the job. */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        ($"user_id" % (1L << XBITS)).as("x"),
        (expr("unix_micros(date_trunc('DAY', ts)) div 86400000000")
          - DAY0).as("y"))
      .select($"y",
        explode(array(
          struct(lit("linear_user_major").as("layout"),
            expr(s"(x * ${1L << YBITS} + y) div ${1L << FILE_SHIFT}")
              .as("file_id")),
          struct(lit("zorder").as("layout"),
            expr(s"($zkeySpark) div ${1L << FILE_SHIFT}").as("file_id"))))
          .as("lf"))
      .groupBy($"lf.layout".as("layout"), $"lf.file_id".as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .groupBy($"layout")
      .agg(
        count(lit(1)).as("n_files"),
        sum($"n_rows").as("n_rows"),
        sum($"max_y" - $"min_y" + 1).as("sum_day_span"),
        sum(when($"min_y" <= PROBE_Y && $"max_y" >= PROBE_Y, 1L)
          .otherwise(0L)).as("probe_files"))
      .orderBy($"layout")
  }

  val zorderLayoutSql: String =
    s"""WITH keyed AS (
       |  SELECT y, x * ${1L << YBITS} + y AS lin_key, $zkeyDuck AS z_key
       |  FROM (
       |    SELECT user_id % ${1L << XBITS} AS x,
       |      epoch_us(date_trunc('day', ts)) // 86400000000 - $DAY0 AS y
       |    FROM events)),
       |files AS (
       |  SELECT 'linear_user_major' AS layout,
       |    lin_key // ${1L << FILE_SHIFT} AS file_id,
       |    COUNT(*) AS n_rows, MIN(y) AS min_y, MAX(y) AS max_y
       |  FROM keyed GROUP BY 1, 2
       |  UNION ALL
       |  SELECT 'zorder' AS layout, z_key // ${1L << FILE_SHIFT} AS file_id,
       |    COUNT(*) AS n_rows, MIN(y) AS min_y, MAX(y) AS max_y
       |  FROM keyed GROUP BY 1, 2)
       |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
       |  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       |  CAST(SUM(max_y - min_y + 1) AS BIGINT) AS sum_day_span,
       |  CAST(SUM(CASE WHEN min_y <= $PROBE_Y AND max_y >= $PROBE_Y
       |    THEN 1 ELSE 0 END) AS BIGINT) AS probe_files
       |FROM files GROUP BY layout ORDER BY layout""".stripMargin

  // --- L2: stable global row-id assignment (distributed zipWithIndex) ---

  /** Contiguous GLOBAL row ids in doc_id order — the "every training
    * example gets exactly one dense index" primitive a shard manifest /
    * data loader needs, WITHOUT the single-partition global window that
    * `row_number() OVER (ORDER BY …)` plans (Spark funnels the whole
    * relation through ONE task for an unpartitioned window — the
    * canonical 100-TB scale-killer).
    *
    * The scalable identity (zipWithIndex's, made deterministic): block
    * the key space into fixed-width key blocks (`doc_id div 1024` — a
    * pure per-row expression, so the "partition" a row lands in never
    * depends on sampled range boundaries or physical task layout),
    * count rows per block, prefix-sum the block counts into offsets with
    * a TWO-LEVEL prefix sum (round 13): blocks group into superblocks of
    * 1024 (`blk div 1024`), local offsets are summed inside each
    * superblock by a HASH-partitioned window (≤1024 rows per partition),
    * and only the SUPERBLOCK total dictionary — |corpus| / 2²⁰ rows, the
    * same order as the other allowlisted dictionaries — crosses the one
    * single-partition running-sum window. (The round-12 form prefix-
    * summed the block dictionary directly: |corpus|/1024 rows through
    * one task GROWS with the corpus — 10⁸ rows in one task at 10¹¹
    * docs.) Offsets are broadcast back, rows rank LOCALLY inside their
    * block with a hash-partitioned window; row_id = superblock offset +
    * in-superblock block offset + in-block rank. Every corpus-sized
    * stage is hash-partitioned; the single-task stage is ~10⁵ rows at
    * 10¹¹ docs. The same trick applies once more (super-superblocks) if
    * a key space ever outgrows that.
    *
    * The oracle IS the single-window form — the hash gate proves the
    * distributed blocked assignment equals `row_number()` exactly. */
  /** The blocked assignment on any (doc_id, lang) relation, ids starting
    * at `base + 1` — shared by the batch query (base 0) and the
    * streaming continuation twin (base = ids assigned so far). */
  private[graft] def globalRowIdsOf(docs: DataFrame, base: Long): DataFrame = {
    import docs.sparkSession.implicits._
    val B = 1024L
    val SB = 1024L // blocks per superblock
    val W = org.apache.spark.sql.expressions.Window
    val blocked = docs
      .select($"doc_id", $"lang", expr(s"doc_id div ${B}L").as("blk"))
    val counts = blocked.groupBy($"blk").agg(count(lit(1)).as("c"))
      .withColumn("sblk", expr(s"blk div ${SB}L"))
    // level 1: offset of each block WITHIN its superblock (hash-partitioned
    // window, ≤ SB rows per partition)
    val wLoc = W.partitionBy($"sblk").orderBy($"blk")
      .rowsBetween(W.unboundedPreceding, -1)
    val withLocal = counts
      .withColumn("loff", coalesce(sum($"c").over(wLoc), lit(0L)))
    // level 2: running sum over the superblock-total dictionary — the ONLY
    // single-partition window, |corpus| / (B·SB) rows
    val wSb = W.orderBy($"sblk").rowsBetween(W.unboundedPreceding, -1)
    val sbOffsets = counts.groupBy($"sblk").agg(sum($"c").as("sc"))
      .withColumn("soff", coalesce(sum($"sc").over(wSb), lit(0L)))
      .select($"sblk", $"soff")
    val offsets = withLocal.join(broadcast(sbOffsets), Seq("sblk"))
      .select($"blk", ($"soff" + $"loff").as("off"))
    val wLocal = W.partitionBy($"blk").orderBy($"doc_id")
    blocked.join(broadcast(offsets), Seq("blk"))
      .select((lit(base) + $"off" + row_number().over(wLocal)).as("row_id"),
        $"doc_id", $"lang")
  }

  def globalRowIds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    globalRowIdsOf(Tables.documents(s, dir), 0L).orderBy($"doc_id")
  }

  val globalRowIdsSql: String =
    """SELECT ROW_NUMBER() OVER (ORDER BY doc_id) AS row_id, doc_id, lang
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- L3: shard assignment + resharding-cost audit ---------------------

  /** Shard count under audit and the count after adding one shard. */
  private val SHARDS = 16
  private val SHARDS2 = 17

  /** 16-bit integer key from the first 4 hex chars of md5(doc_id) —
    * engine-portable (no `conv()` in DuckDB): each hex digit's value is
    * its 1-based position in the alphabet minus one. `posFn` is the
    * engine's substring-position function (Spark `instr`, DuckDB
    * `strpos`); both are 1-based. */
  private def hashKey(posFn: String, m: String): String =
    Seq(4096, 256, 16, 1).zipWithIndex.map { case (w, i) =>
      s"(($posFn('0123456789abcdef', substring($m, ${i + 1}, 1)) - 1) * $w)"
    }.mkString(" + ")

  /** Shard-placement audit over `documents`: assign every doc to one of
    * [[SHARDS]] shards under two strategies — `mod` (`h % S`, the naive
    * hash-mod placement) and `range` (`h·S div 2^16`, fixed hash-RANGE
    * slices, the consistent-hashing family) — and measure, per shard,
    * the balance deviation AND how many of its documents would MOVE if
    * the shard count grew to [[SHARDS2]].
    *
    * This is the resharding-cost primitive behind every sharded corpus
    * manifest: at 100 TB, re-labelling a document is a full rewrite of
    * its bytes, so the placement function's stability under fleet growth
    * IS the cost model. The audit pins the textbook asymmetry: mod
    * rehashing relocates ≈ S/(S+1) of every shard (~94%), while range
    * rehashing relocates only the slice boundaries' spillover (~1/(S+1),
    * ~6%) — same balance, 16× less movement.
    *
    * Scale shape: ONE corpus scan; each row explodes to its two
    * (strategy, shard) assignments with a precomputed moved flag (a
    * codegen Generate over 2 structs, not two passes); the only exchange
    * carries ≤ 2·S groups after partial aggregation. The balance window
    * runs over the 2·S-row aggregate, partitioned by strategy — never
    * the corpus. All arithmetic is 64-bit integer (hex-digit positions,
    * shifts, `div`), bit-identical in both engines; `dev_bp` is computed
    * as `(n·S·10⁴ div total) − 10⁴` so every `div` sees non-negative
    * operands (Spark `div` truncates, DuckDB `//` floors — they agree
    * only at ≥ 0). */
  /** Per-document shard routing under both strategies — shared by the
    * batch audit and the streaming router twin
    * ([[graft.streaming.StreamJobs.shardRouteStream]]): a PURE per-row
    * function (md5 → 16-bit key → mod/range slots), so it is legal on an
    * unbounded stream with no keyed state and no watermark, and the
    * stream's assignment equals the batch's row-for-row by
    * construction. */
  private[graft] def shardRouteOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val h = hashKey("instr", "m")
    docs
      .select($"doc_id", $"n_chars", md5($"doc_id".cast("string")).as("m"))
      .select($"doc_id", $"n_chars", expr(h).as("h"))
      .select($"doc_id", $"n_chars", $"h",
        ($"h" % SHARDS).as("shard_mod"),
        expr(s"(h * $SHARDS) div 65536").as("shard_range"))
  }

  def shardAssignment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assigned = shardRouteOf(Tables.documents(s, dir))
      .select($"n_chars",
        explode(array(
          struct(lit("mod").as("strategy"),
            $"shard_mod".as("shard"),
            when($"h" % SHARDS =!= $"h" % SHARDS2, 1L).otherwise(0L)
              .as("moved")),
          struct(lit("range").as("strategy"),
            $"shard_range".as("shard"),
            when($"shard_range" =!=
              expr(s"(h * $SHARDS2) div 65536"), 1L).otherwise(0L)
              .as("moved")))).as("a"))
      .groupBy($"a.strategy".as("strategy"), $"a.shard".as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("tot_chars"),
        sum($"a.moved").as("n_moved"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"strategy")
    assigned
      .withColumn("total", sum($"n_docs").over(w))
      .select($"strategy", $"shard", $"n_docs", $"tot_chars",
        (expr(s"(n_docs * $SHARDS * 10000) div total") - 10000L)
          .as("dev_bp"),
        $"n_moved", expr("(n_moved * 10000) div n_docs").as("moved_bp"))
      .orderBy($"strategy", $"shard")
  }

  val shardAssignmentSql: String = {
    val h = hashKey("strpos", "m")
    s"""WITH keyed AS (
       |  SELECT n_chars, $h AS h
       |  FROM (SELECT n_chars, md5(CAST(doc_id AS VARCHAR)) AS m
       |        FROM documents)),
       |assigned AS (
       |  SELECT strategy, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_chars) AS BIGINT) AS tot_chars,
       |    CAST(SUM(moved) AS BIGINT) AS n_moved
       |  FROM (
       |    SELECT n_chars, 'mod' AS strategy, h % $SHARDS AS shard,
       |      CASE WHEN h % $SHARDS <> h % $SHARDS2 THEN 1 ELSE 0 END AS moved
       |    FROM keyed
       |    UNION ALL
       |    SELECT n_chars, 'range' AS strategy, (h * $SHARDS) // 65536 AS shard,
       |      CASE WHEN (h * $SHARDS) // 65536 <> (h * $SHARDS2) // 65536
       |        THEN 1 ELSE 0 END AS moved
       |    FROM keyed)
       |  GROUP BY strategy, shard)
       |SELECT strategy, shard, n_docs, tot_chars,
       |  CAST((n_docs * $SHARDS * 10000) // SUM(n_docs) OVER (PARTITION BY strategy)
       |    - 10000 AS BIGINT) AS dev_bp,
       |  n_moved, CAST((n_moved * 10000) // n_docs AS BIGINT) AS moved_bp
       |FROM assigned ORDER BY strategy, shard""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_zorder_layout", zorderLayout, Some(zorderLayoutSql),
      "L1 Z-order vs linear layout data-skipping audit (file min/max stats)"),
    QueryDef("q_global_row_ids", globalRowIds, Some(globalRowIdsSql),
      "L2 distributed zipWithIndex: dense global ids via range partition + offset broadcast, == row_number"),
    QueryDef("q_shard_assignment", shardAssignment, Some(shardAssignmentSql),
      "L3 shard placement + resharding-cost audit: mod vs hash-range at S->S+1"))
}
