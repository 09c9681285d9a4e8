package graft.analytics

import graft.{Ops, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recursive-hierarchy operators (R tier): transitive closure over a
  * parent-pointer forest. Spark has no `WITH RECURSIVE`; the scale-correct
  * substitute is pointer jumping (path doubling) — each round every node's
  * ancestor pointer jumps to its ancestor's ancestor, so a depth-D tree
  * flattens in ceil(log2 D) equi-join rounds instead of D sequential ones.
  * This is the same bounded-round discipline as the dedup tier's connected
  * components ([[graft.ext.DedupQueries]]), applied to DIRECTED forests
  * (org charts, category trees, thread/reply graphs, file-system paths).
  *
  * The forest is derived deterministically from the orders table: node set
  * = o_orderkey, parent(k) = k div 7; a node is a root when it is its own
  * parent (k = 0) or when its parent key is absent from the node set (the
  * sparse-key case — the derivation never assumes dense keys). Parent keys
  * are strictly smaller than child keys, so the structure is acyclic by
  * construction.
  */
object HierarchyQueries {

  /** Pointer-jump rounds. Depth of the derived tree is log7(max key), so
    * 5 rounds (2^5 = 32 levels) cover key spaces up to 7^32 — any scale.
    * Keys are non-negative, so Spark's truncating `div` and DuckDB's
    * flooring `//` agree. */
  private val JUMPS = 5

  /** R1: flatten the forest to (node → root, depth) by path doubling and
    * emit the per-depth audit rollup (population + exact money mass per
    * level) — the compact shape a lineage/rollup job reports.
    *
    * Scale: root/non-root classification is one left_anti against the node
    * set; each jump round is one equi-join of the pointer table with
    * itself (shuffle on the ancestor key) + localCheckpoint to keep the
    * lineage flat — log-bounded rounds, never a depth-proportional chain.
    * No driver-side state, no assumption the tree fits anywhere. */
  def hierarchyClosure(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nodes = Tables.orders(s, dir)
      .select($"o_orderkey".as("k"), Ops.money($"o_totalprice").as("price"))
    val cand = nodes.select($"k", expr("k div 7").as("pk"))
    val keys = nodes.select($"k".as("pk"))
    // Roots: self-parent (k = 0) or parent key absent from the node set.
    val roots = cand.where($"k" === $"pk").select($"k")
      .unionByName(
        cand.where($"k" =!= $"pk").join(keys, Seq("pk"), "left_anti")
          .select($"k"))
    val nonRoots =
      cand.where($"k" =!= $"pk").join(keys, Seq("pk"), "left_semi")
    // Pointer state: (node, anc, dist). Roots point at themselves with
    // dist 0, so jumping is idempotent once a pointer reaches its root.
    var st = roots.select($"k".as("node"), $"k".as("anc"), lit(0L).as("dist"))
      .unionByName(nonRoots.select($"k".as("node"), $"pk".as("anc"),
        lit(1L).as("dist")))
      .localCheckpoint()
    for (_ <- 1 to JUMPS) {
      val hop = st.select($"node".as("h_node"), $"anc".as("h_anc"),
        $"dist".as("h_dist"))
      st = st.join(hop, st("anc") === hop("h_node"))
        .select($"node", $"h_anc".as("anc"), ($"dist" + $"h_dist").as("dist"))
        .localCheckpoint()
    }
    st.select($"node".as("k"), $"dist".as("depth"))
      .join(nodes, Seq("k"))
      .groupBy($"depth")
      .agg(count(lit(1)).as("n_nodes"), sum($"price").cast("double")
        .as("sum_price"))
      .orderBy($"depth")
  }

  /** DuckDB mirror: the same forest walked with WITH RECURSIVE (breadth-
    * first from the roots), so the closure semantics — not the doubling
    * mechanics — are what the hash pins. */
  val hierarchyClosureSql: String =
    """WITH RECURSIVE nodes AS (
      |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders),
      |walk AS (
      |  SELECT k, CAST(0 AS BIGINT) AS depth FROM nodes n0
      |  WHERE k = k // 7
      |     OR NOT EXISTS (SELECT 1 FROM nodes p WHERE p.k = n0.k // 7)
      |  UNION ALL
      |  SELECT n.k, w.depth + 1 FROM nodes n
      |  JOIN walk w ON n.k // 7 = w.k AND n.k <> n.k // 7)
      |SELECT depth, COUNT(*) AS n_nodes,
      |  CAST(SUM(price) AS DOUBLE) AS sum_price
      |FROM walk JOIN nodes USING (k)
      |GROUP BY depth ORDER BY depth""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_hierarchy_closure", hierarchyClosure,
      Some(hierarchyClosureSql),
      "R1 recursive forest closure via log-round pointer jumping vs WITH RECURSIVE"))
}
