package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared-CTE materialization rewrite (the round-12 gate-outage fix):
  * exact insertion behavior on crafted SQL, plus registry-wide invariants
  * that keep the scanner's assumptions true for every real oracle. */
class OracleSqlSpec extends AnyFunSuite {
  import OracleSql.materializeShared

  test("CTE referenced twice is materialized; single-ref stays inlined") {
    val sql =
      """WITH shared AS (SELECT 1 AS x),
        |once AS (SELECT x FROM shared)
        |SELECT * FROM shared JOIN once USING (x)""".stripMargin
    val out = materializeShared(sql)
    assert(out.contains("shared AS MATERIALIZED (SELECT 1"))
    assert(out.contains("once AS (SELECT x"))
  }

  test("chained rounds: every level of an unrolled chain with fan-out ≥2 is materialized") {
    // the q_graph_kcore shape in miniature: each round references the
    // previous round's edge set twice — exactly the combinatorial case.
    val sql =
      """WITH e0 AS (SELECT 1 AS src, 2 AS dst),
        |k1 AS (SELECT src FROM e0 GROUP BY src),
        |e1 AS (SELECT e.src, e.dst FROM e0 e JOIN k1 x ON e.src = x.src JOIN k1 y ON e.dst = y.src),
        |k2 AS (SELECT src FROM e1 GROUP BY src),
        |e2 AS (SELECT e.src, e.dst FROM e1 e JOIN k2 x ON e.src = x.src JOIN k2 y ON e.dst = y.src)
        |SELECT COUNT(*) FROM e2""".stripMargin
    val out = materializeShared(sql)
    assert(out.contains("e0 AS MATERIALIZED"))
    assert(out.contains("e1 AS MATERIALIZED"))
    assert(out.contains("k1 AS MATERIALIZED"))
    assert(out.contains("k2 AS MATERIALIZED"))
    // e2 is referenced once — stays inlined for pushdown
    assert(out.contains("e2 AS (SELECT"))
  }

  test("recursive (self-referencing) CTEs are never materialized") {
    val sql =
      """WITH RECURSIVE reach(src, lbl) AS (
        |  SELECT 1, 2
        |  UNION
        |  SELECT src, lbl + 1 FROM reach WHERE lbl < 5)
        |SELECT * FROM reach JOIN reach r2 USING (src)""".stripMargin
    assert(materializeShared(sql) === sql)
  }

  test("named WINDOW clauses are untouched even when the window name repeats") {
    val sql =
      """WITH base AS (SELECT 1 AS a, 2 AS b)
        |SELECT SUM(a) OVER w, AVG(b) OVER w FROM base
        |WINDOW w AS (PARTITION BY a ORDER BY b)""".stripMargin
    val out = materializeShared(sql)
    assert(!out.contains("w AS MATERIALIZED"))
    assert(out === sql) // base referenced once
  }

  test("parens inside string literals do not derail body matching") {
    val sql =
      """WITH pat AS (SELECT regexp_extract(c, '([a-z]+) (\(x\)', 1) AS g FROM t),
        |u AS (SELECT g FROM pat)
        |SELECT * FROM pat JOIN u USING (g)""".stripMargin
    val out = materializeShared(sql)
    assert(out.contains("pat AS MATERIALIZED (SELECT regexp_extract"))
  }

  test("escaped quotes ('') inside literals are handled") {
    val sql =
      """WITH s AS (SELECT 'it''s (a trap)' AS v),
        |t AS (SELECT v FROM s)
        |SELECT * FROM s JOIN t USING (v)""".stripMargin
    val out = materializeShared(sql)
    assert(out.contains("s AS MATERIALIZED (SELECT 'it''s"))
  }

  test("already-MATERIALIZED and NOT MATERIALIZED hints are left alone") {
    val sql =
      """WITH a AS MATERIALIZED (SELECT 1 AS x),
        |b AS NOT MATERIALIZED (SELECT 2 AS x)
        |SELECT * FROM a JOIN a a2 USING (x) JOIN b USING (x) JOIN b b2 USING (x)""".stripMargin
    assert(materializeShared(sql) === sql)
  }

  test("names shadowed by a nested WITH are never materialized (DuckDB 1.0 binder bug)") {
    // materializing the OUTER definition of a name that a nested WITH
    // redefines trips INTERNAL "Recursive CTE scan found without
    // recursive CTE node" in DuckDB 1.0 — which invalidates the whole
    // connection and cascades the rest of a sequential gate (the r13
    // full-sweep reproduction: q_ann_frontier's `norms`/`scored`).
    val sql =
      """WITH norms AS (SELECT 1 AS vec_id, 2 AS nrm),
        |other AS (SELECT vec_id FROM norms),
        |truth AS (SELECT * FROM (
        |  WITH norms AS (SELECT 3 AS vec_id, 4 AS nrm) SELECT vec_id FROM norms))
        |SELECT * FROM norms JOIN other USING (vec_id) JOIN truth USING (vec_id)
        |UNION ALL SELECT * FROM norms JOIN other o2 USING (vec_id) JOIN truth t2 USING (vec_id)""".stripMargin
    val out = materializeShared(sql)
    assert(!out.contains("norms AS MATERIALIZED"), out)
    // non-shadowed multi-ref CTEs in the same statement still materialize
    assert(out.contains("other AS MATERIALIZED"), out)
    assert(out.contains("truth AS MATERIALIZED"), out)
  }

  test("non-WITH SQL passes through unchanged") {
    val sql = "SELECT l_returnflag, SUM(l_quantity) FROM lineitem GROUP BY 1"
    assert(materializeShared(sql) === sql)
  }

  test("registry assembly applies the rewrite: kcore/pagerank chains are materialized") {
    val byName = Registry.all.map(q => q.name -> q).toMap
    val kcore = byName("q_graph_kcore").oracle.get
    // the shared LSH CTEs and every peel round's edge set fan out ≥2×
    assert(kcore.contains("sigs AS MATERIALIZED"))
    assert(kcore.contains("e0 AS MATERIALIZED"))
    assert(kcore.contains("e1 AS MATERIALIZED"))
    val pr = byName("q_graph_pagerank").oracle.get
    assert(pr.contains("adj AS MATERIALIZED") || pr.contains("sym AS MATERIALIZED"))
  }

  test("scanner assumptions hold for every registered oracle") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // no SQL line comments (the scanner does not strip them)
      assert(!sql.contains("--"), s"$name: oracle SQL must not use -- comments")
      // the rewrite is idempotent (re-applying inserts nothing new)
      assert(OracleSql.materializeShared(sql) === sql,
        s"$name: materializeShared must be idempotent after assembly")
    }
  }
}
