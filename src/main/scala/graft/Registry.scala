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
  /** All query groups, assembled by SparkEntry. */
  def all: Seq[QueryDef] =
    analytics.CoreQueries.defs ++
      analytics.CboQueries.defs ++
      analytics.SubqueryQueries.defs ++
      analytics.EventQueries.defs ++
      analytics.BehaviorQueries.defs ++
      analytics.StatsQueries.defs ++
      analytics.HierarchyQueries.defs ++
      analytics.GeoQueries.defs ++
      analytics.LayoutQueries.defs ++
      analytics.WarehouseQueries.defs ++
      analytics.IncrementalQueries.defs ++
      analytics.SurfaceQueries.defs ++
      analytics.QualityGate.defs ++
      ext.FuzzyQueries.defs ++
      analytics.Profiler.defs ++
      ingest.IngestQueries.defs ++
      ext.DedupQueries.defs ++
      ext.SimJoinQueries.defs ++
      ext.GraphQueries.defs ++
      ext.CurateQueries.defs ++
      ext.SimilarityQueries.defs ++
      ext.TextQueries.defs ++
      ext.RetrievalQueries.defs ++
      ext.SamplingQueries.defs ++
      ext.PipelineQueries.defs ++
      ext.MultimodalQueries.defs
}
