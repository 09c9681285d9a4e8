package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet persistence for trained index ARTIFACTS — the cross-
  * session completion of the in-session `GraftSession.memo` discipline.
  * Everything the similarity/dedup/text tiers train once and probe many
  * times (the learned IVF centroid table, the PQ codebook and corpus code
  * table, the BPE merge table, z-score fits) is a small deterministic
  * relation; a real deployment trains it in one job, SHIPS it, and every
  * consumer — batch queries, the streaming ingest twins that re-resolve
  * their static side per micro-batch ([[graft.streaming.StreamJobs
  * .dimEnrichStream]]/[[graft.streaming.StreamJobs.annIngestStream]]) —
  * loads the current version by name.
  *
  * Layout: `root/name/v=N/…parquet` plus `root/name/_latest` holding N.
  * Versions are immutable once written; [[save]] writes v=N+1 and then
  * atomically points `_latest` at it (rename-over, the
  * `StreamJobs.latestStateUpsert` crash-safety pattern), so a reader
  * never observes a half-written version: it either resolves the old
  * pointer or the new one. A streaming consumer picks up a re-trained
  * artifact WITHOUT restart by calling [[load]] per micro-batch inside
  * `foreachBatch` — a fresh load resolves the current pointer and lists
  * the new version directory, whereas a static DataFrame bound at query
  * start pins its original file listing (plan re-execution does not
  * re-list; both behaviors are pinned in ArtifactSpec). An aborted save
  * leaves only an unreferenced v-directory behind, never a broken
  * pointer.
  *
  * Scale: artifacts are index-sized (K centroids, M×K codewords, N merge
  * rows), not corpus-sized — single-digit parquet files; the corpus-sized
  * PQ code table still fits the same shape since it is written once at
  * ingest and only scanned afterwards.
  */
object ArtifactStore {

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def latestPath(root: String, name: String) =
    new Path(s"$root/$name/_latest")

  /** Highest version currently published for `name`, 0 if none. */
  def latestVersion(s: SparkSession, root: String, name: String): Int = {
    val lp = latestPath(root, name)
    val f = fs(s, lp)
    if (!f.exists(lp)) 0
    else {
      val in = f.open(lp)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt
      finally in.close()
    }
  }

  /** Versions retained by [[save]]'s post-publish prune: the newly
    * published version plus `RETAIN - 1` predecessors (rollback window).
    * Without a bound, a daily re-train accumulates version directories
    * forever — each index-sized, but unbounded count is still a leak. */
  val Retain = 3

  /** Persist `df` as the next version of `name`; returns the version
    * written. The version directory is fully written BEFORE the pointer
    * moves; only after the pointer flips are versions older than the
    * newest [[Retain]] deleted, so the prune can never touch a directory
    * `_latest` still resolves to — a reader that resolved the pointer
    * before the flip reads a version inside the retention window. */
  def save(df: DataFrame, root: String, name: String): Int = {
    val s = df.sparkSession
    val v = latestVersion(s, root, name) + 1
    df.write.mode("overwrite").parquet(s"$root/$name/v=$v")
    val lp = latestPath(root, name)
    val tmp = new Path(s"$root/$name/_latest.tmp")
    val f = fs(s, lp)
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(lp)) f.delete(lp, false)
    f.rename(tmp, lp)
    // keep-last-K retention, AFTER the pointer moved: list the v=N
    // directories (including any unreferenced leftovers from aborted
    // saves) and drop everything older than the newest Retain versions
    val dir = new Path(s"$root/$name")
    f.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("v=")) {
        val old = scala.util.Try(n.stripPrefix("v=").toInt)
          .toOption.exists(_ <= v - Retain)
        if (old) f.delete(st.getPath, true)
      }
    }
    v
  }

  /** All version numbers currently on disk for `name`, ascending —
    * retention audit surface (the published one is [[latestVersion]]). */
  def versionsOnDisk(s: SparkSession, root: String, name: String): Seq[Int] = {
    val dir = new Path(s"$root/$name")
    val f = fs(s, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("v=").toInt).toOption)
      .sorted
  }

  // --- tombstones: the delete path of a published artifact ---------------
  // A 100-TB vector store must REMOVE vectors, not only add them (the
  // retention-by-predicate concern, applied to the index). Deletes are
  // decoupled from the corpus-sized artifact rewrite: each delete batch
  // appends key rows to an append-only tombstone LOG next to the
  // versioned data (`root/name/_tombstones/`); readers subtract the log
  // ([[loadSurviving]]) so a delete is visible immediately, and a
  // periodic [[compact]] folds the log into a fresh data version and
  // clears it. Log append is O(batch), compaction is one anti-join — no
  // per-delete rewrite of the artifact.

  private def tombDir(root: String, name: String) =
    new Path(s"$root/$name/_tombstones")

  /** Append delete keys to `name`'s tombstone log. Idempotent at the
    * semantic level: tombstoning an id twice (or an id not in the data)
    * just adds log rows the anti-join ignores. */
  def tombstone(ids: DataFrame, root: String, name: String): Unit =
    ids.write.mode("append").parquet(tombDir(root, name).toString)

  /** The current tombstone log (distinct keys), empty-schema-free: None
    * when no delete has ever been recorded. */
  def tombstones(s: SparkSession, root: String, name: String): Option[DataFrame] = {
    val d = tombDir(root, name)
    if (!fs(s, d).exists(d)) None else Some(s.read.parquet(d.toString).distinct())
  }

  /** The latest published version MINUS the tombstone log — the read-side
    * view that makes a delete visible BEFORE compaction lands. `key` is
    * the artifact's identity column (e.g. `vec_id`). */
  def loadSurviving(s: SparkSession, root: String, name: String,
      key: String): DataFrame = {
    val data = load(s, root, name)
    tombstones(s, root, name) match {
      case None => data
      case Some(t) => data.join(t.select(key), Seq(key), "left_anti")
    }
  }

  /** Fold the tombstone log into the data: publish a new version holding
    * only surviving rows, then clear the log. Returns the new version
    * (or the current one untouched when the log is empty). Crash-safe in
    * the same sense as [[save]]: if the process dies between the publish
    * and the log delete, the next compact re-applies the same tombstones
    * to rows that no longer exist — a no-op anti-join — and clears the
    * log then. Single writer assumed, like [[save]]. */
  def compact(s: SparkSession, root: String, name: String,
      key: String): Int = {
    tombstones(s, root, name) match {
      case None => latestVersion(s, root, name)
      case Some(t) =>
        val survivors = load(s, root, name)
          .join(t.select(key), Seq(key), "left_anti")
        val v = save(survivors, root, name)
        fs(s, tombDir(root, name)).delete(tombDir(root, name), true)
        v
    }
  }

  /** Load the latest published version of `name` (or an explicit
    * `version`). Fails fast if nothing was ever published.
    *
    * Explicit-version loads only resolve inside the [[Retain]]-deep
    * rollback window: [[save]]'s post-publish prune deletes anything
    * older, so pinning `version` more than `Retain - 1` saves back fails
    * (AnalysisException on the missing directory). The store assumes a
    * SINGLE WRITER per artifact name; a reader that resolved the OLDEST
    * retained version races a concurrent save's prune — readers wanting
    * a stable snapshot should resolve `_latest` (always at least one
    * save away from the prune horizon) or copy the version out. */
  def load(s: SparkSession, root: String, name: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(s, root, name))
    require(v > 0, s"no published version of artifact '$name' under $root")
    s.read.parquet(s"$root/$name/v=$v")
  }
}
