package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{SimilarityQueries, TextQueries}
import graft.sources.ArtifactStore
import graft.streaming.StreamJobs

/** Cross-session artifact persistence: trained index artifacts round-trip
  * through the versioned store byte-equal, version pointers resolve to
  * the newest publish, and CONSUMERS run correctly off the loaded copy —
  * the deployment story behind every "trained once, probed everywhere"
  * claim in the similarity/text tiers. */
class ArtifactSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val sf = TestSpark.sf0001
  import spark.implicits._

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[Row] = {
    val cols = df.columns.sorted.map(col).toSeq
    df.select(cols: _*).collect().toSet
  }

  test("trained artifacts round-trip the store byte-equal") {
    val root = Files.createTempDirectory("graft-artifacts").toString
    val cents = SimilarityQueries.trainedCents(spark, sf)
    val cb = SimilarityQueries.pqCodebookMemo(spark, sf)
    val merges = TextQueries.bpeMergeTable(spark, sf)
    assert(ArtifactStore.save(cents, root, "ivf_cents") === 1)
    assert(ArtifactStore.save(cb, root, "pq_codebook") === 1)
    assert(ArtifactStore.save(merges, root, "bpe_merges") === 1)
    assert(rowSet(ArtifactStore.load(spark, root, "ivf_cents")) === rowSet(cents))
    assert(rowSet(ArtifactStore.load(spark, root, "pq_codebook")) === rowSet(cb))
    assert(rowSet(ArtifactStore.load(spark, root, "bpe_merges")) === rowSet(merges))
  }

  test("save publishes a new version and load resolves the latest") {
    val root = Files.createTempDirectory("graft-artifacts-v").toString
    val v1 = Seq((1L, "a")).toDF("id", "tag")
    val v2 = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    assert(ArtifactStore.save(v1, root, "dim") === 1)
    assert(ArtifactStore.save(v2, root, "dim") === 2)
    assert(ArtifactStore.latestVersion(spark, root, "dim") === 2)
    assert(ArtifactStore.load(spark, root, "dim").count() === 2)
    // explicit pin still reaches the immutable old version
    assert(ArtifactStore.load(spark, root, "dim", Some(1)).count() === 1)
    // loading a never-published name fails fast
    intercept[IllegalArgumentException] {
      ArtifactStore.load(spark, root, "nope")
    }
  }

  test("a consumer off the LOADED index equals the in-session assignment") {
    val root = Files.createTempDirectory("graft-artifacts-c").toString
    ArtifactStore.save(SimilarityQueries.trainedCents(spark, sf), root, "ivf_cents")
    // the streaming ingest twin's static side, resolved from the store —
    // the re-trained-index refresh path made cross-session
    val loaded = ArtifactStore.load(spark, root, "ivf_cents")
    val viaStore = StreamJobs
      .annIngestStream(Tables.embeddings(spark, sf), loaded)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = SimilarityQueries.rankedAssign(spark, sf)
      .filter($"crn" === 1).select($"vec_id", $"c_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStore === batch)
  }
}
