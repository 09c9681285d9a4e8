package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User entry point: a SparkSession wired for this engine — custom
  * functions/rules registered, scale-sane defaults — plus SQL-surface
  * registration of the test-lake tables so `spark.sql` works against them
  * directly.
  */
object GraftSession {

  /** Recommended session for this library. `shufflePartitions` should match
    * cluster parallelism (cores × executors in real deployments). */
  def build(master: String = "local[*]", shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register every test-lake table as a temp view (plus graft functions on
    * an existing session), enabling the full SQL surface:
    * {{{ spark.sql("SELECT haversine_km(...) FROM lineitem ...") }}} */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    plans.GraftExtensions.registerOn(spark)
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir)
        else Tables.load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
  }

  /** Session-scoped memo store: one value map per LIVE SparkSession,
    * weak-keyed on the session instance itself (SparkSession does not
    * override equals, so WeakHashMap gives identity semantics). Guards the
    * two failure modes of identityHashCode-keyed string maps: a stopped,
    * GC'd session's identity hash being reused by a new session — which
    * would be handed DataFrames bound to dead (local)checkpoint blocks —
    * and entries pinning checkpointed data for the JVM lifetime. Entries
    * become unreachable with their session. */
  private val sessionMemos =
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, AnyRef]]()

  /** Memoize `build` per (live session, key). A failed build records
    * nothing (the next caller retries). Builds are serialized per session
    * under a reentrant lock, so a build may itself consult the memo —
    * concurrent first callers block until the value exists, the
    * computeIfAbsent contract the former per-module maps relied on. */
  /** Test hook (RegistrySpec's memoized-plan window guard): when set,
    * [[ckpt]] hands every DataFrame's ANALYZED logical plan to the
    * auditor right before materializing it. ckpt is the repo-wide choke
    * point for memoized/iterative materialization (a source-level test
    * bans bare `.localCheckpoint()` elsewhere), so an auditor installed
    * here sees every plan that would otherwise hide behind a checkpoint
    * leaf — the one class the declared-plan walks cannot reach. Residual
    * blind spot, documented: builds that materialize through a WRITE or
    * a driver-side collect (fmt_roundtrip's landings, trained-codebook
    * collects) never pass a plan to ckpt. */
  @volatile private[graft] var planAuditor:
    Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan => Unit] = None

  /** Test hook: drop a session's memo entries so the next consumer
    * re-runs every build (under an installed [[planAuditor]], typically).
    * Already-handed-out DataFrames stay valid — their checkpoint blocks
    * are pinned by their own RDD references, not by the map. */
  private[graft] def clearMemos(s: SparkSession): Unit =
    sessionMemos.synchronized {
      val mm = sessionMemos.get(s)
      if (mm != null) mm.synchronized { mm.clear() }
    }

  def memo[A <: AnyRef](s: SparkSession, key: String)(build: => A): A = {
    val m = sessionMemos.synchronized {
      var mm = sessionMemos.get(s)
      if (mm == null) {
        mm = new java.util.HashMap[String, AnyRef]()
        sessionMemos.put(s, mm)
      }
      mm
    }
    m.synchronized {
      var v = m.get(key)
      if (v == null) { v = build; m.put(key, v) }
      v.asInstanceOf[A]
    }
  }

  /** Fingerprint a set of tables' parquet files (names/sizes/mtimes) so a
    * regenerated sf dir yields a different cache key — the same staleness
    * guard dppFactsPath uses. */
  def contentKey(dir: String, tables: Seq[String]): String = {
    val sig = tables.map { t =>
      val f = new java.io.File(dir, s"$t.parquet")
      val parts = if (f.isDirectory) f.listFiles().sortBy(_.getName) else Array(f)
      parts.map(p => s"${p.getName}:${p.length}:${p.lastModified}").mkString("|")
    }.mkString(s"$dir||", "||", "")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).take(6)
      .map(b => f"${b & 0xff}%02x").mkString
  }

  /** Register `tables` as external catalog tables (prefixed by a content
    * fingerprint, so several sf dirs — or a regenerated one — coexist)
    * and compute table + column statistics, the input the cost-based
    * optimizer's join-reorder DP needs. Done once per (session, content);
    * on a real deployment this is the scheduled `ANALYZE TABLE` pass
    * after each load. The registration runs inside computeIfAbsent, so a
    * failure mid-way records nothing (the next caller retries) and a
    * concurrent second caller blocks until the tables and stats actually
    * exist. Returns the table-name prefix. */
  def ensureStats(spark: SparkSession, dir0: String,
      tables: Seq[String]): String = {
    // absolutize: CREATE TABLE ... LOCATION resolves a RELATIVE path
    // against the warehouse dir, not the CWD — a relative sf dir (the
    // round-18 scale-tier run passed `data/sf1`) would register empty
    // locations and fail with UNABLE_TO_INFER_SCHEMA
    val dir = new java.io.File(dir0).getAbsolutePath
    val key = contentKey(dir, tables)
    memo(spark, s"cbo_stats|$key") {
      val prefix = s"cbo_${key}_"
      tables.foreach { t =>
        val name = prefix + t
        spark.sql(s"DROP TABLE IF EXISTS $name")
        spark.sql(s"CREATE TABLE $name USING parquet LOCATION '$dir/$t.parquet'")
        spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      prefix
    }
  }

  /** Lineage-flattening checkpoint for iterative operators (pointer-jump
    * hierarchy rounds, connected-components label propagation, PageRank).
    *
    * Default: `localCheckpoint()` — executor block storage, which keeps the
    * lineage flat but is NOT fault-tolerant: losing an executor forfeits
    * its blocks and there is no lineage left to recompute them from. Fine
    * on local[n] (one JVM — if it dies the job is gone anyway); a real
    * risk on a 1000-executor cluster where single-executor loss is routine.
    *
    * Opt-in reliable mode: set `spark.graft.checkpoint.dir` to a durable
    * store (HDFS/S3 path) and every iterative round writes a RELIABLE
    * checkpoint there instead — executor loss then costs re-reading one
    * round's files, never restarting the whole iteration. Off by default
    * because each reliable round pays a full write+read round-trip, which
    * only buys anything when executors can actually be lost.
    *
    * The SparkContext checkpoint dir is applied on FIRST use and
    * SparkContext offers no unset — a later, different
    * `spark.graft.checkpoint.dir` cannot take effect for the context's
    * lifetime, so such a mismatch is loudly warned rather than silently
    * ignored. Checkpoint files accumulate per round: long-lived sessions
    * should enable `spark.cleaner.referenceTracking.cleanCheckpoints=true`
    * (files are then removed when the checkpointed RDD is GC'd) or point
    * the dir at storage with a retention/TTL policy. */
  def ckpt(df: DataFrame, eager: Boolean = true,
      level: Option[org.apache.spark.storage.StorageLevel] = None): DataFrame = {
    planAuditor.foreach(_(df.queryExecution.analyzed))
    val s = df.sparkSession
    s.conf.getOption("spark.graft.checkpoint.dir").filter(_.nonEmpty) match {
      case Some(d) =>
        val sc = s.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
        // setCheckpointDir stores the path fully qualified (e.g. a file:
        // scheme prefix), so compare with that tolerance
        else if (!sc.getCheckpointDir.exists(cur =>
            cur == d || cur.stripPrefix("file:") == d || cur.endsWith(d)))
          System.err.println(
            s"[graft] WARNING: spark.graft.checkpoint.dir=$d differs from " +
              s"the context's established checkpoint dir " +
              s"${sc.getCheckpointDir.get}; SparkContext offers no reset — " +
              "reliable checkpoints keep writing to the established dir")
        df.checkpoint(eager)
      case None => level match {
        case Some(l) => df.localCheckpoint(eager, l)
        case None => df.localCheckpoint(eager)
      }
    }
  }

  /** Materialize-then-sort presentation helper (r21). A GLOBAL sort's
    * RangePartitioner SAMPLES its child to pick partition bounds, so when
    * nothing below the sort is a shuffle (narrow pipelines, broadcast
    * joins, memo scans) the ENTIRE upstream executes twice — once for the
    * sampler, once for the real shuffle. One [[ckpt]] barrier before the
    * sort makes both passes read materialized rows instead. Use where the
    * upstream is expensive per row (decode, regex, folds, joins) and the
    * sorted relation is the query's own output (which must materialize
    * anyway); leave plain `orderBy` where the child is already an
    * aggregate/shuffle (AQE reuses the materialized stage) or a bare
    * cheap scan. Measured (sf1, local[32]): q_tokens_per_doc 10.95 →
    * 6.5 s, q_token_ids 28.6 → 20.9 s — the double fold was the whole
    * difference. */
  def presentSorted(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame = {
    // session-conf kill switch (default on) — exists so the A/B harness
    // can measure both forms in one JVM; results identical either way
    val on = df.sparkSession.conf
      .getOption("spark.graft.presort.ckpt").forall(_.toBoolean)
    // LAZY checkpoint: the range-sampler's pass is the one that computes
    // and materializes the blocks, the sort's shuffle re-reads them — two
    // jobs total, upstream computed once. (An eager ckpt costs a third
    // job, which at sub-second query sizes erased the win.)
    // DISK_ONLY: a corpus-sized sorted output (the tokenized corpus at the
    // 100× tier is ~10 GB of blocks) stored at the default
    // MEMORY_AND_DISK level OOMed the 32 g bench JVM — each bench pass
    // constructs a fresh checkpoint and the old passes' blocks leave
    // memory only when their RDDs are GC'd, so live copies accumulate in
    // the storage pool. Disk blocks stream in and out without unroll
    // memory, are bounded by disk (not heap), and at the small tiers ride
    // the page cache — the sf0.1/sf1 wins re-measured unchanged.
    if (on)
      ckpt(df, eager = false,
        level = Some(org.apache.spark.storage.StorageLevel.DISK_ONLY))
        .orderBy(cols: _*)
    else df.orderBy(cols: _*)
  }

  private val cboLock = new Object

  /** Run `body` with the cost-based optimizer (and its join-reorder DP)
    * enabled, restoring the previous confs after. Callers must force
    * planning (e.g. touch `queryExecution.executedPlan`) inside `body` —
    * QueryExecution phases are lazy vals, so the frozen plan keeps the
    * CBO decisions while the session confs revert for everyone else.
    * Serialized: overlapping calls would otherwise restore each other's
    * "previous" conf values and leave CBO enabled for the session. */
  def withCbo[A](spark: SparkSession)(body: => A): A = cboLock.synchronized {
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val prevReorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try body finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevReorder)
    }
  }
}
