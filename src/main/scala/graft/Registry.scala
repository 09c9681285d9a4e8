package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator-query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Column names/aliases MUST be identical on both sides — the driver sorts
  * columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  /** Query groups keyed by tier name (the contributing module). The bench
    * reports a per-tier subtotal for each group so drift is attributable
    * to a tier, not just the grand total.
    *
    * Every oracle passes through [[OracleSql.materializeShared]] here —
    * the single assembly choke point — so shared-CTE chains are always
    * emitted `AS MATERIALIZED` for DuckDB regardless of how the module
    * authored them (round-12 lesson: one inlined unrolled-chain oracle ran
    * >25 min and zeroed the whole round's correctness record). */
  def groups: Seq[(String, Seq[QueryDef])] = rawGroups.map { case (t, qs) =>
    t -> qs.map(q => q.copy(oracle = q.oracle.map(OracleSql.materializeShared)))
  }

  private def rawGroups: Seq[(String, Seq[QueryDef])] = Seq(
    "core" -> analytics.CoreQueries.defs,
    "cbo" -> analytics.CboQueries.defs,
    "subquery" -> analytics.SubqueryQueries.defs,
    "event" -> analytics.EventQueries.defs,
    "behavior" -> analytics.BehaviorQueries.defs,
    "stats" -> analytics.StatsQueries.defs,
    "hierarchy" -> analytics.HierarchyQueries.defs,
    "geo" -> analytics.GeoQueries.defs,
    "layout" -> analytics.LayoutQueries.defs,
    "warehouse" -> analytics.WarehouseQueries.defs,
    "incremental" -> analytics.IncrementalQueries.defs,
    "surface" -> analytics.SurfaceQueries.defs,
    "quality" -> analytics.QualityGate.defs,
    "fuzzy" -> ext.FuzzyQueries.defs,
    "profile" -> analytics.Profiler.defs,
    "ingest" -> ingest.IngestQueries.defs,
    "dedup" -> ext.DedupQueries.defs,
    "simjoin" -> ext.SimJoinQueries.defs,
    "graph" -> ext.GraphQueries.defs,
    "curate" -> ext.CurateQueries.defs,
    "similarity" -> ext.SimilarityQueries.defs,
    "text" -> ext.TextQueries.defs,
    "retrieval" -> ext.RetrievalQueries.defs,
    "sampling" -> ext.SamplingQueries.defs,
    "pipeline" -> ext.PipelineQueries.defs,
    "multimodal" -> ext.MultimodalQueries.defs)

  /** All query groups, assembled by SparkEntry. */
  def all: Seq[QueryDef] = groups.flatMap(_._2)

  /** query name -> tier name (for the bench's per-tier subtotals). */
  def tierOf: Map[String, String] =
    groups.flatMap { case (tier, qs) => qs.map(_.name -> tier) }.toMap
}
