package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming plan guards (round 18, VERDICT r17 item 3): every streaming
  * query the test suite runs is walked through the SAME scale-killer
  * guards RegistrySpec applies to the 263 declared batch queries —
  * CartesianProduct banned outright, BroadcastNestedLoopJoin banned
  * unless allowlisted with its boundedness reason, and Sort/Window over
  * an `Exchange SinglePartition` banned unless the window provably runs
  * over a dictionary.
  *
  * Mechanism: the specs call [[StreamGuards.stop]] instead of `q.stop()`.
  * The hook synchronously captures the query's last micro-batch EXECUTED
  * plan (via the test-scope [[StreamBridge]] — streaming runs with AQE
  * off, so the static walk RegistrySpec uses applies directly), runs the
  * guards, and accumulates any violation plus the query's name into
  * global sets. Synchronous capture from the held query reference means
  * no listener-bus race: by the time `stop` returns, the verdict for
  * that query is recorded. StreamingSpec and ArtifactSpec each end with
  * a test asserting (a) zero accumulated violations and (b) that their
  * own expected query-name set was actually guarded — so a spec that
  * silently stops exercising an entry point fails coverage, and
  * StreamingPlanSpec's reflection test forces every NEW StreamJobs entry
  * point into the mapping.
  */
object StreamGuards {

  /** Violations across every guarded streaming query, in arrival order,
    * tagged `suite|text` (round 19, advice r18: the accumulators were
    * global across suites, so one suite's coverage assertion could be
    * satisfied vacuously by another suite's runs, and a violation from
    * one suite failed whichever suite's closing test happened to run —
    * racy attribution under parallel suite execution). */
  val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** `suite|name` entries whose micro-batch plan was captured+guarded. */
  val covered: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The calling Spec's simple name, read off the stack — both [[stop]]
    * and [[assertClean]] are invoked directly from inside a suite's test
    * body, so the first frame whose class sits in a `graft.*Spec` (or a
    * lambda/inner class thereof) names the owning suite deterministically.
    */
  private def callerSuite: String = {
    // dotted segments allowed so suites in subpackages (graft.streaming.
    // FooSpec) attribute correctly instead of falling to "global"
    // (advice r19)
    val re = """graft\.(?:[a-z0-9_]+\.)*([A-Za-z0-9_]+Spec)""".r
    Thread.currentThread().getStackTrace.iterator
      .flatMap(f => re.findFirstMatchIn(f.getClassName).map(_.group(1)))
      .nextOption()
      .getOrElse("global")
  }

  /** BNLJ allowlist: streaming query name -> the boundedness reason
    * (same discipline as RegistrySpec.allowBnlj — a single-row or
    * dictionary-sized broadcast side crossed onto the stream).
    */
  private val allowBnlj: Map[String, String] = Map(
    // ONE single-row broadcast of the whole ordered merge table crossed
    // onto the doc stream — RegistrySpec's q_tokens_per_doc entry; the
    // rest of the micro-batch plan is the narrow fused fold
    "tok_stream_out" -> "single-row merge-table broadcast (q_tokens_per_doc class)",
    // merge-table broadcast + the vocab's alphabet-count broadcast; the
    // vocab lookup itself is a broadcast HASH equi-join on token —
    // RegistrySpec's q_token_ids entry
    "tokid_stream_out" -> "merge-table + alphabet-count broadcasts (q_token_ids class)",
    // the K-row centroid table packed into one broadcast array crossed
    // onto the vector stream (the stateless argmax assignment) —
    // RegistrySpec's q_sim_knn_ivf class
    "ann_ingest_out" -> "K-row centroid-array broadcast (q_sim_knn_ivf class)",
    // single-row hashed-unigram weight-table broadcast crossed onto the
    // doc stream; the admission verdict is a per-row fold —
    // RegistrySpec's q_dsir_select entry
    "dsir_admit_out" -> "single-row importance-map broadcast (q_dsir_select class)"
  )

  /** Single-partition Sort/Window allowlist: name -> dictionary bound
    * (same discipline as RegistrySpec.allowDictWindow).
    */
  private val allowDictWindow: Map[String, String] = Map(
    // the Pareto front served from the standing skyline dictionary —
    // |distinct lens| rows, the q_skyline_docs class
    "skyline_frontier" -> "length dictionary",
    // the id continuation's level-2 prefix sum over the SUPERBLOCK total
    // dictionary (|corpus| / 2^20 rows) — the q_global_row_ids allowlist
    // entry in RegistrySpec, same bound
    "global_ids_update" -> "superblock dictionary"
  )

  private def unwrap(p: SparkPlan): SparkPlan =
    p.getClass.getSimpleName match {
      case "WholeStageCodegenExec" | "InputAdapter" | "ProjectExec" |
           "FilterExec" | "ColumnarToRowExec" => unwrap(p.children.head)
      case _ => p
    }

  /** The RegistrySpec Sort/Window-over-SinglePartition walk, verbatim. */
  def spWindowHits(p: SparkPlan): Seq[String] = {
    val n = p.getClass.getSimpleName
    val hit =
      if (n == "SortExec" || n == "WindowExec" || n == "WindowGroupLimitExec")
        p.children.map(unwrap).collect {
          case e if e.getClass.getSimpleName == "ShuffleExchangeExec" &&
            e.outputPartitioning.toString == "SinglePartition" => n
        }
      else Seq.empty
    hit ++ p.children.flatMap(spWindowHits)
  }

  /** Run the negative guards over one captured plan; returns violations. */
  def check(name: String, plan: SparkPlan): Seq[String] = {
    val s = plan.toString
    val cart =
      if (s.contains("CartesianProduct")) Seq(s"$name: CartesianProduct")
      else Seq.empty
    val bnlj =
      if (s.contains("BroadcastNestedLoopJoin") && !allowBnlj.contains(name))
        Seq(s"$name: BroadcastNestedLoopJoin")
      else Seq.empty
    val sp =
      if (allowDictWindow.contains(name)) Seq.empty
      else spWindowHits(plan)
        .map(op => s"$name: $op over Exchange SinglePartition")
    cart ++ bnlj ++ sp
  }

  /** Guard-then-stop. Always stops the query, even if capture throws.
    * Violations and coverage are recorded under the CALLING suite, so
    * each suite's closing test asserts exactly its own runs. */
  def stop(q: StreamingQuery): Unit = {
    try {
      val suite = callerSuite
      val name = Option(q.name).getOrElse(s"unnamed:${q.id}")
      StreamBridge.lastExecutedPlan(q).foreach { plan =>
        check(name, plan).foreach(v => violations.add(s"$suite|$v"))
        covered.add(s"$suite|${Option(q.name).getOrElse("unnamed")}"): Unit
      }
    } finally q.stop()
  }

  /** Assert helper for the per-suite closing tests: checks only the
    * entries the CALLING suite recorded. */
  def assertClean(expectedNames: Set[String]): Unit = {
    val suite = callerSuite
    val v = violations.toArray(Array.empty[String])
      .filter(_.startsWith(s"$suite|")).map(_.stripPrefix(s"$suite|"))
    assert(v.isEmpty,
      s"streaming plan-guard violations in $suite:\n${v.mkString("\n")}")
    val got = scala.jdk.CollectionConverters.SetHasAsScala(covered).asScala
      .filter(_.startsWith(s"$suite|")).map(_.stripPrefix(s"$suite|")).toSet
    val missing = expectedNames.diff(got)
    // fail LOUDLY on zero attribution: if this suite recorded nothing at
    // all but other entries exist, the near-certain cause is a caller-
    // attribution miss (stop() invoked from a thread whose stack doesn't
    // carry the suite class) — name the suites that DID record so the
    // mismatch is visible instead of a bare "never captured" (advice r19)
    val attributionHint =
      if (got.isEmpty && expectedNames.nonEmpty) {
        val others = scala.jdk.CollectionConverters
          .SetHasAsScala(covered).asScala.map(_.takeWhile(_ != '|')).toSeq
          .distinct.sorted
        s"\nNOTHING was recorded under $suite — if stop() ran on a " +
          s"Spark-owned thread, attribution fell elsewhere; suites with " +
          s"recorded entries: ${others.mkString(", ")}"
      } else ""
    assert(missing.isEmpty,
      s"streaming queries expected to be plan-guarded in $suite but never " +
        s"captured: ${missing.toSeq.sorted.mkString(", ")}$attributionHint")
  }
}
