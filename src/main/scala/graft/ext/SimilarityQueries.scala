package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (SURVEY.md §2.9 X3):
  * brute-force cosine top-k as the correctness baseline, a random-hyperplane
  * LSH-bucketed variant as the scale path, and label-blocked cosine near-dup
  * detection.
  *
  * Determinism across engines: dot products are computed in exact DECIMAL
  * (decimal addition is associative, so partial-aggregation order cannot
  * change the result), then converted to double for the final cosine — both
  * engines produce bit-identical doubles. Hyperplanes are derived from md5
  * (identical in Spark/DuckDB/JVM), not an RNG.
  */
object SimilarityQueries {

  private val DIM = 64
  private val PLANES = 8

  /** Stride for packed (score desc, id asc) arg-max keys: key =
    * `cq * ID_STRIDE - id`. Sound iff `0 <= id < ID_STRIDE` and the pack
    * stays inside a long — here `|cq| <= 10^6` (scores are cosine ppm by
    * construction), so `|key| <= 10^6·10^12 + 10^12 ≈ 1.001e18 < 2^63`.
    * 10^12 ids covers a 100 TB embedding corpus (~4·10^11 vectors at
    * 256 B/vec) with headroom; the r12 stride of 10^7 silently corrupted
    * the (cosine desc, id asc) order once ids reached 10^7, identically
    * in both engine mirrors, so the hash gate could never catch it.
    * Shared by the Spark side and every SQL mirror — change it in ONE
    * place or the gate drifts. RegistrySpec pins the stride bound against
    * the testdata id range; the scale bound is documented, not runtime-
    * asserted (an assert would cost a corpus pass per query). */
  private[graft] val ID_STRIDE = 1000000000000L

  /** Quantize a float component to an exact integer: floor(x * 1e6) as
    * BIGINT. float→double is exact, the double multiply and floor are
    * IEEE-deterministic, so both engines produce the identical integer —
    * and integer sums are order-independent, immune to partial-aggregation
    * order. (A float→DECIMAL cast is NOT safe: Spark routes it through
    * Float.toString, DuckDB rounds the binary value.) */
  private def q6(x: Column): Column = floor(x.cast(DoubleType) * 1000000L)

  /** Quantize a whole embedding once — pair-wise dots then run on plain
    * long arrays instead of re-quantizing both sides per candidate pair. */
  private def q6Arr(emb: Column): Column = transform(emb, x => q6(x))

  /** Exact integer dot product of two pre-quantized (long) arrays — the
    * codegen'd native expression; see [[graft.functions.LongArrayDot]] for
    * why this beats the aggregate/zip_with HOF pair on the pair-scoring
    * hot path. */
  private def dotQ(a: Column, b: Column): Column =
    graft.functions.LongArrayDot.longArrayDot(a, b)

  /** Exact integer dot product of two raw float arrays. */
  private def decDot(a: Column, b: Column): Column = dotQ(q6Arr(a), q6Arr(b))

  /** Cosine from exact-integer dot/norms; double math is IEEE-identical on
    * both engines given identical inputs. */
  private def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast(DoubleType) / (sqrt(na.cast(DoubleType)) * sqrt(nb.cast(DoubleType)))

  /** DuckDB mirror: exact integer dot via unnested index sum (integer SUM is
    * order-independent). `a`/`b` are embedding list expressions; requires an
    * unnested index `g` in scope. */
  private def q6Sql(x: String): String =
    s"CAST(floor(CAST($x AS DOUBLE) * 1000000) AS BIGINT)"
  private def dotSql(a: String, b: String): String =
    s"CAST(SUM(${q6Sql(s"$a[i.g]")} * ${q6Sql(s"$b[i.g]")}) AS BIGINT)"

  private val idxSql = s"(SELECT unnest(generate_series(1, $DIM)) AS g) i"

  private def normsCte: String =
    s"""norms AS (
       |  SELECT vec_id, ${dotSql("embedding", "embedding")} AS nrm
       |  FROM embeddings, $idxSql GROUP BY vec_id)""".stripMargin

  // --- X3a: brute-force cosine top-k -------------------------------------
  /** Top-5 cosine neighbors for query vectors (vec_id < 20) against the full
    * table. The query side is broadcast; the scan side streams — at scale
    * this is one pass over the corpus per (small) query batch. */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val withNorm = e
      .select($"vec_id", q6Arr($"embedding").as("qe"))
      .select($"vec_id", $"qe", dotQ($"qe", $"qe").as("nrm"))
    val q = withNorm.filter($"vec_id" < 20)
      .toDF("q_id", "q_emb", "q_nrm")
    val scored = withNorm.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter($"rnk" <= 5)
      .orderBy($"q_id", $"rnk")
      .select($"q_id", $"rnk", $"vec_id", $"cos_sim")
  }

  val knnBruteSql: String =
    s"""WITH $normsCte,
       |dots AS (
       |  SELECT q.vec_id AS q_id, v.vec_id AS vec_id,
       |    ${dotSql("q.embedding", "v.embedding")} AS dot
       |  FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id, $idxSql
       |  WHERE q.vec_id < 20
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT q_id, dots.vec_id AS vec_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
       |  FROM dots
       |  JOIN norms qn ON q_id = qn.vec_id
       |  JOIN norms vn ON dots.vec_id = vn.vec_id)
       |SELECT q_id, rnk, vec_id, cos_sim FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin

  // --- X3b: LSH-bucketed ANN (the scale path) ----------------------------
  /** md5-derived ±1 hyperplane entries — reproducible in any engine.
    * Plane j, component i (1-based): parity of first hex char of md5("j_i").
    */
  def planeSign(j: Int, i: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${j}_$i".getBytes("UTF-8"))
    val hex1 = "%02x".format(d(0) & 0xff).charAt(0)
    (hex1.toInt % 2) * 2 - 1
  }

  /** Signed dot of a pre-quantized (long) embedding against a ±1 plane. */
  private def planeDot(qe: Column, j: Int): Column = {
    val signs = typedLit((1 to DIM).map(i => planeSign(j, i).toLong))
    graft.functions.LongArrayDot.longArrayDot(qe, signs)
  }

  private def bucketCol(qe: Column): Column =
    (0 until PLANES)
      .map(j => when(planeDot(qe, j) > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)

  /** ANN: candidates = same hyperplane bucket, then exact cosine re-rank
    * top-5. At 100 TB the bucket column is precomputed at write time and the
    * candidate join is equi on the bucket — one shuffle, no cross product. */
  def knnLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", q6Arr($"embedding").as("qe"))
      .select($"vec_id", $"qe", dotQ($"qe", $"qe").as("nrm"),
        bucketCol($"qe").as("bucket"))
    val q = e.filter($"vec_id" < 20).toDF("q_id", "q_emb", "q_nrm", "q_bucket")
    val scored = e.join(broadcast(q),
        $"bucket" === $"q_bucket" && $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter($"rnk" <= 5)
      .orderBy($"q_id", $"rnk")
      .select($"q_id", $"rnk", $"vec_id", $"cos_sim")
  }

  /** DuckDB mirror of [[bucketCol]]: hyperplane-sign bucket per vec_id. */
  private val bucketsCte: String = {
    val planeDots = (0 until PLANES).map { j =>
      s"SUM(${q6Sql("embedding[i.g]")} * " +
        s"((ascii(substring(md5($j || '_' || i.g), 1, 1)) % 2) * 2 - 1)) AS pd$j"
    }.mkString(",\n    ")
    val bucketExpr = (0 until PLANES)
      .map(j => s"(CASE WHEN pd$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""plane_dots AS (
       |  SELECT vec_id,
       |    $planeDots
       |  FROM embeddings, $idxSql GROUP BY vec_id),
       |buckets AS (
       |  SELECT vec_id, $bucketExpr AS bucket FROM plane_dots)""".stripMargin
  }

  val knnLshSql: String = {
    s"""WITH $normsCte,
       |$bucketsCte,
       |dots AS (
       |  SELECT q.vec_id AS q_id, v.vec_id AS vec_id,
       |    ${dotSql("q.embedding", "v.embedding")} AS dot
       |  FROM embeddings q
       |  JOIN buckets qb ON q.vec_id = qb.vec_id
       |  JOIN buckets vb ON qb.bucket = vb.bucket AND q.vec_id <> vb.vec_id
       |  JOIN embeddings v ON v.vec_id = vb.vec_id, $idxSql
       |  WHERE q.vec_id < 20
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT q_id, dots.vec_id AS vec_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
       |  FROM dots
       |  JOIN norms qn ON q_id = qn.vec_id
       |  JOIN norms vn ON dots.vec_id = vn.vec_id)
       |SELECT q_id, rnk, vec_id, cos_sim FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin
  }

  // --- X3b': IVF-flat ANN (coarse quantizer + probe) ---------------------
  private val NPROBE = 2

  /** Centroid-count FLOOR. Round 20 (r19 verdict item 1): K is no longer
    * a fixed 16 — a fixed K means every probed list is O(n/K), so
    * per-query serving cost grows linearly with the corpus, the opposite
    * of what an index is for. K now scales as
    * `max(IVF_K, ceil(n / IVF_TARGET_LIST))` ([[ivfK]]), which pins the
    * EXPECTED list size at ≤ [[IVF_TARGET_LIST]] and makes per-query probe
    * cost (nprobe · list) roughly FLAT in n. The floor keeps every tier
    * the driver gates on (n ≤ 16·target ⇒ K = 16) byte-identical to the fixed-K
    * engine. Training stays sane: assignment is O(n·K) = O(n²/target) only
    * if trained on the full corpus — at real scale the Lloyd loop runs on
    * a bounded SAMPLE (the scaladoc contract below) and the corpus pass is
    * assignment only; past broadcastable K (~10⁶ rows) the design shards
    * the quantizer hierarchically exactly like [[semDepth]] does for the
    * dedup blocker. */
  private[graft] val IVF_K = 16

  /** Target expected inverted-list size: K is chosen so n/K ≲ this. 1024
    * is the standard IVF list grain (FAISS-style deployments run 1-8 Ki):
    * the per-query scan (NPROBE·1024 rows) stays cache-resident and flat
    * in n, centroid-table growth is n/1024 (broadcastable far past any
    * tested tier), and — the binding constraint here — the DuckDB oracle
    * mirrors that unroll the FULL Lloyd loop stay tractable at every
    * committed sweep tier (each assignment CTE is n·64·K rows; a 512
    * target made the six-arm q_ann_eval mirror's concurrent chains spill
    * ~70 GB at sf1). */
  private[graft] val IVF_TARGET_LIST = 1024L

  /** The K growth law, integer-exact: `max(IVF_K, ceil(n / target))`.
    * Mirrored verbatim by [[ivfKSql]] — both engines compute ceil as
    * `(n + target−1) div target` on non-negative integers, so the parity
    * is exact at every n. */
  private[graft] def ivfK(n: Long): Int = {
    // overflow-safe ceil: (n−1)/t + 1 == (n+t−1)/t for n ≥ 1 without the
    // n+511 wraparound at Long.MaxValue; the Int cast saturates (a 2³¹-row
    // centroid table is far past the hierarchical-sharding point anyway)
    val k = if (n <= 0) IVF_K.toLong
      else math.max(IVF_K.toLong, (n - 1) / IVF_TARGET_LIST + 1)
    math.min(k, Int.MaxValue.toLong).toInt
  }

  /** Corpus vector count for the K growth law, memoized per (session,
    * dir) — verdict r20 item 6: `knnIvf` ran a fresh `embeddings.count()`
    * action per query build (parquet-metadata cheap, but a driver
    * round-trip per invocation). The count is a property of the lake, so
    * it rides the session memo like the other trained statics. */
  private[graft] def embCount(s: SparkSession, dir: String): Long =
    graft.GraftSession.memo(s, s"emb_count|$dir")(
      java.lang.Long.valueOf(Tables.embeddings(s, dir).count())).longValue

  /** DuckDB mirror of [[ivfK]] over a count expression. */
  private def ivfKSql(countExpr: String): String =
    s"GREATEST($IVF_K, (($countExpr) + ${IVF_TARGET_LIST - 1}) // $IVF_TARGET_LIST)"

  /** IVF-flat: a deterministic coarse quantizer (the [[ivfK]](n) vectors
    * with the smallest md5 rank serve as centroids — at real scale these
    * come from a sampled k-means, with K derived the same way), vectors
    * assigned to their nearest centroid's inverted list, queries probe the
    * NPROBE nearest lists and re-rank exactly. The centroid pick is a
    * global top-K (TakeOrderedAndProject — one pass, no full sort). At
    * 100 TB the assignment is precomputed at ingest and the probe join is
    * equi on the centroid id — the scan per query is |corpus|/K × NPROBE
    * ≈ NPROBE · [[IVF_TARGET_LIST]], flat in the corpus size. */
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", q6Arr($"embedding").as("qe"))
      .select($"vec_id", $"qe", dotQ($"qe", $"qe").as("nrm"))
    val cents = e
      .orderBy(md5(concat(lit("ivf_"), $"vec_id".cast(StringType))).asc,
        $"vec_id".asc)
      .limit(ivfK(embCount(s, dir)))
      .toDF("c_id", "c_qe", "c_nrm")
    val scoredCents = e.join(broadcast(cents), lit(true))
      .select($"vec_id", $"qe", $"nrm", $"c_id",
        cosine(dotQ($"qe", $"c_qe"), $"nrm", $"c_nrm").as("c_cos"))
    val wAssign = Window.partitionBy($"vec_id").orderBy($"c_cos".desc, $"c_id".asc)
    val ranked = scoredCents
      .withColumn("crn", row_number().over(wAssign))
    val assign = ranked.filter($"crn" === 1)
      .select($"vec_id", $"c_id".as("bucket"))
    val probes = ranked.filter($"vec_id" < 20 && $"crn" <= NPROBE)
      .select($"vec_id".as("q_id"), $"qe".as("q_emb"), $"nrm".as("q_nrm"),
        $"c_id".as("bucket"))
    val scored = probes.join(assign, Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .join(e, Seq("vec_id"))
      .select($"q_id", $"vec_id",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
      .distinct()
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter($"rnk" <= 5)
      .orderBy($"q_id", $"rnk")
      .select($"q_id", $"rnk", $"vec_id", $"cos_sim")
  }

  val knnIvfSql: String =
    s"""WITH $normsCte,
       |cent_ids AS (
       |  SELECT vec_id FROM embeddings
       |  ORDER BY md5('ivf_' || CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT (SELECT ${ivfKSql("COUNT(*)")} FROM embeddings)),
       |cent_scores AS (
       |  SELECT v.vec_id, c.vec_id AS c_id,
       |    CAST(${dotSql("v.embedding", "c.embedding")} AS DOUBLE)
       |      / (sqrt(CAST(vn.nrm AS DOUBLE)) * sqrt(CAST(cn.nrm AS DOUBLE))) AS c_cos
       |  FROM embeddings v
       |  JOIN norms vn ON v.vec_id = vn.vec_id
       |  JOIN embeddings c ON c.vec_id IN (SELECT vec_id FROM cent_ids)
       |  JOIN norms cn ON c.vec_id = cn.vec_id, $idxSql
       |  GROUP BY v.vec_id, c.vec_id, vn.nrm, cn.nrm),
       |ranked AS (
       |  SELECT vec_id, c_id,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id ASC) AS crn
       |  FROM cent_scores),
       |assign AS (SELECT vec_id, c_id AS bucket FROM ranked WHERE crn = 1),
       |probes AS (SELECT vec_id AS q_id, c_id AS bucket FROM ranked
       |  WHERE vec_id < 20 AND crn <= $NPROBE),
       |cands AS (
       |  SELECT DISTINCT p.q_id, a.vec_id
       |  FROM probes p JOIN assign a ON p.bucket = a.bucket
       |  WHERE a.vec_id <> p.q_id),
       |scored AS (
       |  SELECT ca.q_id, ca.vec_id,
       |    CAST(${dotSql("q.embedding", "v.embedding")} AS DOUBLE)
       |      / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
       |  FROM cands ca
       |  JOIN embeddings q ON ca.q_id = q.vec_id
       |  JOIN embeddings v ON ca.vec_id = v.vec_id
       |  JOIN norms qn ON ca.q_id = qn.vec_id
       |  JOIN norms vn ON ca.vec_id = vn.vec_id, $idxSql
       |  GROUP BY ca.q_id, ca.vec_id, qn.nrm, vn.nrm)
       |SELECT q_id, rnk, vec_id, cos_sim FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin

  // --- X3b''': IVF with LEARNED centroids (bounded k-means) --------------
  /** k-means refinement rounds over the md5-picked seed (a constant). */
  private[graft] val KM_ROUNDS = 2

  /** Probe count for the learned variant: refined lists are tighter, so the
    * true neighbors concentrate in fewer lists, but the top-5 bar of the
    * recall spec needs 4 of 16 lists scanned (25% of the corpus per query —
    * still |corpus|/K × nprobe, the IVF contract). */
  private val NPROBE2 = 4

  /** Exact integer floor-division mean of the quantized components:
    * floor(Σqv / n). Spark `div` truncates toward zero, so subtract the
    * positive modulus first — (Σ − pmod(Σ, n)) is exactly divisible and
    * truncation == floor. DuckDB's `//` ALSO truncates on integers
    * ((-7)//2 = -3), so the oracle mirror [[floorDivSql]] applies the
    * same positive-modulus identity — a round-12 fix: the original
    * mirror used bare `//`, which diverges from floor by one on every
    * NEGATIVE non-exact coordinate sum. The drift was invisible for a
    * full round because every oracled consumer emits only cosine RANKS,
    * which are robust to a ±1 centroid coordinate — it surfaced the
    * moment `q_cluster_cards` exposed a centroid-dependent scalar. */
  private def floorDivMean(s: Column, n: Column): Column =
    ((s - pmod(s, n)) / n).cast(LongType)

  /** DuckDB mirror of [[floorDivMean]]: floor(s/n) for any sign of s,
    * n > 0 — `(s − ((s % n + n) % n)) // n` (the subtraction is exactly
    * divisible, so truncating `//` returns the true floor). */
  private def floorDivSql(s: String, n: String): String =
    s"(($s) - ((($s) % ($n) + ($n)) % ($n))) // ($n)"

  /** One k-means assignment pass: every vector to its nearest centroid by
    * exact-integer cosine, ties broken on centroid id. K is a broadcast
    * constant, so this is O(n·K) narrow work — one corpus pass, no shuffle
    * beyond the final argmax window on vec_id. */
  private def kmAssign(e: DataFrame, cents: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val wAssign = Window.partitionBy($"vec_id").orderBy($"c_cos".desc, $"c_id".asc)
    e.join(broadcast(cents), lit(true))
      .select($"vec_id", $"qe", $"nrm", $"c_id",
        cosine(dotQ($"qe", $"c_qe"), $"nrm", $"c_nrm").as("c_cos"))
      .withColumn("crn", row_number().over(wAssign))
  }

  /** One k-means update pass: per-cluster integer-quantized means
    * (floor(Σqv_d / n) per dimension — order-immune integer sums, so
    * partial aggregation cannot change the centroid), reassembled into a
    * long-array centroid with its exact integer norm. localCheckpoint
    * truncates lineage per round (the table is K≤16 rows) so each round's
    * corpus pass runs once instead of once per downstream consumer — the
    * same bounded-iteration pattern as `DedupQueries.clusterLabels`. */
  private def kmUpdate(e: DataFrame, assign: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.join(assign, Seq("vec_id"))
      .select($"c_id", posexplode($"qe").as(Seq("dim", "qv")))
      .groupBy($"c_id", $"dim")
      .agg(sum($"qv").as("sq"), count(lit(1)).as("n"))
      .select($"c_id", $"dim", floorDivMean($"sq", $"n").as("m"))
      .groupBy($"c_id")
      .agg(transform(array_sort(collect_list(struct($"dim", $"m"))),
        x => x.getField("m")).as("c_qe"))
      .select($"c_id", $"c_qe", dotQ($"c_qe", $"c_qe").as("c_nrm"))
      .transform(graft.GraftSession.ckpt(_))
  }

  /** IVF-flat with LEARNED centroids: the md5-picked seed of [[knnIvf]]
    * refined by [[KM_ROUNDS]] bounded Lloyd iterations (assign → exact
    * integer-quantized means → reassign), then the same nprobe + exact
    * re-rank as the flat variant. Every step is engine-deterministic
    * (integer sums, floor division, IEEE doubles, total-order tie-breaks),
    * so the full training loop is mirrored in the DuckDB oracle. At 100 TB
    * the training runs on a SAMPLE and K stays constant, so each round is
    * one O(sample·K) pass with a K-row broadcast and a 64-group aggregate;
    * the final corpus assignment is precomputed at ingest. Probe recall vs
    * the brute-force tier is pinned in ExtSpec. */
  /** Quantized embedding relation (vec_id, qe, nrm) — the input every
    * centroid-based operator shares. */
  private def quantized(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", q6Arr($"embedding").as("qe"))
      .select($"vec_id", $"qe", dotQ($"qe", $"qe").as("nrm"))
  }

  /** md5-seeded + [[KM_ROUNDS]] Lloyd-refined centroid table — shared by
    * the learned-IVF ANN and the semantic-dedup blocker. */
  private[graft] def learnedCents(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    // K derives from the TRAINING corpus size (r19 verdict item 1): the
    // one count here runs once per memoized training, and cohort
    // trainings (centroid drift) get a K matched to their own cohort —
    // exactly what the suffix-parameterized oracle chain computes.
    val k = ivfK(e.count())
    val seed = e
      .orderBy(md5(concat(lit("ivf_"), $"vec_id".cast(StringType))).asc,
        $"vec_id".asc)
      .limit(k)
      .toDF("c_id", "c_qe", "c_nrm")
    (1 to KM_ROUNDS).foldLeft(seed) { (cents, _) =>
      kmUpdate(e, kmAssign(e, cents).filter($"crn" === 1)
        .select($"vec_id", $"c_id"))
    }
  }

  /** The TRAINED index, shared: the post-training probe ranking
    * (vec_id, c_id, crn) for every vector × centroid, memoized per
    * (session, embeddings content) — the minhashPairs pattern. A real
    * deployment trains the coarse quantizer ONCE and precomputes the
    * corpus assignment at ingest; every consumer here (learned-IVF ANN,
    * the semantic-dedup blocker, the nprobe frontier, the ANN audit)
    * probes the same index instead of re-running the Lloyd rounds per
    * query. Only the three id/rank longs are materialized — embeddings
    * re-attach by vec_id where a consumer needs them. */
  /** The trained coarse quantizer itself (c_id, c_qe, c_nrm — K rows),
    * memoized per (session, embeddings content): the static side a
    * streaming ingest job re-resolves per micro-batch
    * ([[graft.streaming.StreamJobs.annIngestStream]]), and the input
    * [[rankedAssign]] assigns the batch corpus against. */
  private[graft] def trainedCents(s: SparkSession, dir: String): DataFrame =
    graft.GraftSession.memo(s, "ivf_cents|" +
        graft.GraftSession.contentKey(dir, Seq("embeddings"))) {
      graft.GraftSession.ckpt(learnedCents(quantized(s, dir)))
    }

  private[graft] def rankedAssign(s: SparkSession, dir: String): DataFrame =
    graft.GraftSession.memo(s, "ivf_ranked|" +
        graft.GraftSession.contentKey(dir, Seq("embeddings"))) {
      import s.implicits._
      graft.GraftSession.ckpt(
        kmAssign(quantized(s, dir), trainedCents(s, dir))
          .select($"vec_id", $"c_id", $"crn"))
    }

  /** Quantize a raw (vec_id, embedding) relation into the shared
    * (vec_id, qe, nrm) form — the prep step both batch and streaming
    * assignment share. */
  private[graft] def quantizeRaw(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    vecs.select($"vec_id", q6Arr($"embedding").as("qe"))
      .select($"vec_id", $"qe", dotQ($"qe", $"qe").as("nrm"))
  }

  /** Nearest-centroid assignment with NO rank window and NO aggregation
    * state: the K centroids ride along as ONE packed array column
    * (broadcast; for index-refresh-without-restart run this inside
    * `foreachBatch` with a per-batch `ArtifactStore.load` — see
    * ArtifactSpec) and the argmax is a per-row fold over that array —
    * legal on an unbounded stream because each vector's bucket is a pure
    * function of the row. The fold keeps (best cos, best c_id) with ties
    * to the smaller centroid id — [[kmAssign]]'s (c_cos DESC, c_id ASC)
    * order — and is fold-order-independent, so the packed list's order
    * can't matter. Returns (vec_id, c_id). */
  private[graft] def assignStateless(vecs: DataFrame, cents: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    val packed = cents.agg(
      collect_list(struct($"c_id", $"c_qe", $"c_nrm")).as("cs"))
    val init = struct(lit(-2.0).cast(DoubleType).as("cos"), lit(-1L).as("cid"))
    val folded = aggregate($"cs", init, (acc, c) => {
      val cos = cosine(dotQ($"qe", c.getField("c_qe")), $"nrm",
        c.getField("c_nrm"))
      val better = cos > acc.getField("cos") ||
        (cos === acc.getField("cos") &&
          c.getField("c_id") < acc.getField("cid"))
      when(better,
        struct(cos.as("cos"), c.getField("c_id").as("cid"))).otherwise(acc)
    })
    quantizeRaw(vecs)
      .join(broadcast(packed), lit(true))
      .select($"vec_id", folded.getField("cid").as("c_id"))
  }

  /** The brute-force top-5 truth pairs (q_id, vec_id), memoized per
    * (session, embeddings content) exactly like [[rankedAssign]]: the one
    * intentionally expensive input of the ANN audit tier, built and
    * checkpointed ONCE and shared by `q_ann_eval` and `q_ann_frontier`
    * (each previously checkpointed its own copy). */
  private[graft] def bruteTruth(s: SparkSession, dir: String): DataFrame =
    graft.GraftSession.memo(s, "ann_truth|" +
        graft.GraftSession.contentKey(dir, Seq("embeddings"))) {
      import s.implicits._
      graft.GraftSession.ckpt(knnBrute(s, dir).select($"q_id", $"vec_id"))
    }

  def knnIvf2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = quantized(s, dir)
    val ranked = rankedAssign(s, dir)
    val assign = ranked.filter($"crn" === 1).select($"vec_id", $"c_id".as("bucket"))
    val probes = ranked.filter($"vec_id" < 20 && $"crn" <= NPROBE2)
      .select($"vec_id", $"c_id".as("bucket"))
      .join(e, Seq("vec_id"))
      .select($"vec_id".as("q_id"), $"qe".as("q_emb"), $"nrm".as("q_nrm"),
        $"bucket")
    val scored = probes.join(assign, Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .join(e, Seq("vec_id"))
      .select($"q_id", $"vec_id",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
      .distinct()
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter($"rnk" <= 5)
      .orderBy($"q_id", $"rnk")
      .select($"q_id", $"rnk", $"vec_id", $"cos_sim")
  }

  /** X3m — FILTERED ANN: top-5 under a metadata predicate (`label = 1`,
    * ~10% selectivity), the vector-database staple every retrieval stack
    * needs ("nearest docs in English", "nearest images with a license").
    * The plan is the PRE-filter architecture: the predicate restricts
    * the inverted LISTS before probing — the filtered assign table is
    * selectivity·|corpus| rows, so per-query scan cost drops to
    * s·|list|·nprobe — rather than post-filtering a full top-k (which
    * under-returns: a top-5 over all labels may contain zero qualifying
    * rows). Same memoized trained index, same exact re-rank; only the
    * candidate stream is filtered.
    *
    * Scale: the filter composes with the list equi-join as an ordinary
    * pushed predicate on the assign side — no new shuffle, no new index;
    * at lower selectivity the same plan degrades gracefully toward
    * brute-over-matching (which is the correct asymptote). */
  /** Filtered probes use a SELECTIVITY-ADAPTIVE depth: at selectivity s
    * each probed list holds only ~s·|list| qualifying candidates, so a
    * fixed nprobe starves the candidate pool as predicates get rarer
    * (measured: 55% recall at nprobe=4 over the ~10% label lists vs 60%+
    * plain). The standard compensation is candidate-pool PARITY — probe
    * `ceil(base / s)` lists so candidates·s stays roughly constant —
    * clamped to [base, K]. The clamp's upper edge is the correct
    * asymptote: once every list is probed the search is exact
    * brute-over-matching. s is MEASURED in-plan (one tiny aggregate that
    * broadcasts; at 100 TB this is a table-stats lookup), so the depth
    * tracks the predicate with no hand-tuned constant per filter; the
    * chosen depth is emitted as an audit row by
    * `q_sim_knn_filtered_audit`, which pins recall at two different
    * selectivities. */
  /** `ceil(NPROBE2 / s)` clamped to `[NPROBE2, K(n_total)]`, integer-exact
    * over (n_total, n_match) columns — identical text in Spark SQL and
    * DuckDB modulo the floor-div spelling. The upper clamp is the DYNAMIC
    * centroid count ([[ivfK]] over n_total — n_total IS the corpus size),
    * so "probe everything" still means exact brute-over-matching after
    * the r20 K scale-up. */
  private def adaptiveNprobeExpr(floorDiv: String): String =
    s"least(greatest($IVF_K, (n_total + ${IVF_TARGET_LIST - 1}) " +
      s"$floorDiv $IVF_TARGET_LIST), greatest($NPROBE2, " +
      s"($NPROBE2 * n_total + n_match - 1) $floorDiv n_match))"

  def knnFiltered(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = quantized(s, dir)
    val lab = Tables.embeddings(s, dir).select($"vec_id", $"label")
    val ranked = rankedAssign(s, dir)
    val sel = lab.agg(count(lit(1)).as("n_total"),
        count(when($"label" === 1, 1)).as("n_match"))
      .selectExpr(s"${adaptiveNprobeExpr("div")} AS nprobe")
    val assign = ranked.filter($"crn" === 1)
      .join(lab.filter($"label" === 1).select($"vec_id"), Seq("vec_id"))
      .select($"vec_id", $"c_id".as("bucket"))
    val probes = ranked.filter($"vec_id" < 20)
      .crossJoin(broadcast(sel))
      .filter($"crn" <= $"nprobe")
      .select($"vec_id", $"c_id".as("bucket"))
      .join(e, Seq("vec_id"))
      .select($"vec_id".as("q_id"), $"qe".as("q_emb"), $"nrm".as("q_nrm"),
        $"bucket")
    val scored = probes.join(assign, Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .join(e, Seq("vec_id"))
      .select($"q_id", $"vec_id",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
      .distinct()
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter($"rnk" <= 5)
      .orderBy($"q_id", $"rnk")
      .select($"q_id", $"rnk", $"vec_id", $"cos_sim")
  }

  lazy val knnFilteredSql: String =
    s"""WITH $kmeansCtesSql,
       |sel AS (
       |  SELECT COUNT(*) AS n_total,
       |    COUNT(*) FILTER (WHERE label = 1) AS n_match
       |  FROM embeddings),
       |np AS (SELECT ${adaptiveNprobeExpr("//")} AS nprobe FROM sel),
       |assign AS (
       |  SELECT r.vec_id, r.c_id AS bucket FROM aranked3 r
       |  JOIN embeddings l ON r.vec_id = l.vec_id
       |  WHERE r.crn = 1 AND l.label = 1),
       |probes AS (SELECT vec_id AS q_id, c_id AS bucket FROM aranked3, np
       |  WHERE vec_id < 20 AND crn <= np.nprobe),
       |cands AS (
       |  SELECT DISTINCT p.q_id, a.vec_id
       |  FROM probes p JOIN assign a ON p.bucket = a.bucket
       |  WHERE a.vec_id <> p.q_id),
       |scored AS (
       |  SELECT ca.q_id, ca.vec_id,
       |    CAST(${dotSql("q.embedding", "v.embedding")} AS DOUBLE)
       |      / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
       |  FROM cands ca
       |  JOIN embeddings q ON ca.q_id = q.vec_id
       |  JOIN embeddings v ON ca.vec_id = v.vec_id
       |  JOIN norms qn ON ca.q_id = qn.vec_id
       |  JOIN norms vn ON ca.vec_id = vn.vec_id, $idxSql
       |  GROUP BY ca.q_id, ca.vec_id, qn.nrm, vn.nrm)
       |SELECT q_id, rnk, vec_id, cos_sim FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin

  /** Serve FILTERED top-5 for a batch of arriving query vectors against
    * the published index — the per-micro-batch core of the streaming
    * filtered-ANN twin ([[graft.streaming.StreamJobs
    * .annFilteredServeStream]]), also usable as a plain batch serve.
    * `cents` is the trained coarse quantizer (in deployment,
    * `ArtifactStore.load`-ed per batch — the refresh-without-restart
    * pattern), `corpus` the indexed (vec_id, embedding, label) relation.
    * Each query is centroid-scored against the broadcast quantizer,
    * probes its adaptive-nprobe nearest lists ([[adaptiveNprobeExpr]] —
    * same in-plan selectivity measurement as [[knnFiltered]]), and
    * re-ranks exactly over the label-filtered candidates. Because the
    * probe ranking is the same deterministic cosine + tie-break the
    * trained [[rankedAssign]] stores, serving a corpus member re-derives
    * exactly its stored probe order — StreamingSpec pins stream == batch
    * [[knnFiltered]] row-for-row.
    *
    * Contains per-query rank windows, so on a stream it runs inside
    * `foreachBatch` (every micro-batch is a complete batch relation) —
    * the same deployment shape as the artifact-refresh consumers. */
  private[graft] def filteredServe(queryVecs: DataFrame, cents: DataFrame,
      corpus: DataFrame): DataFrame = {
    import queryVecs.sparkSession.implicits._
    val e = quantizeRaw(corpus.select($"vec_id", $"embedding"))
    val lab = corpus.select($"vec_id", $"label")
    val sel = lab.agg(count(lit(1)).as("n_total"),
        count(when($"label" === 1, 1)).as("n_match"))
      .selectExpr(s"${adaptiveNprobeExpr("div")} AS nprobe")
    val assign = assignStateless(corpus.select($"vec_id", $"embedding"), cents)
      .join(lab.filter($"label" === 1).select($"vec_id"), Seq("vec_id"))
      .select($"vec_id", $"c_id".as("bucket"))
    val qScored = quantizeRaw(queryVecs).join(broadcast(cents), lit(true))
      .select($"vec_id".as("q_id"), $"qe".as("q_emb"), $"nrm".as("q_nrm"),
        $"c_id",
        cosine(dotQ($"qe", $"c_qe"), $"nrm", $"c_nrm").as("c_cos"))
    val wP = Window.partitionBy($"q_id").orderBy($"c_cos".desc, $"c_id".asc)
    val probes = qScored.withColumn("crn", row_number().over(wP))
      .crossJoin(broadcast(sel))
      .filter($"crn" <= $"nprobe")
      .select($"q_id", $"q_emb", $"q_nrm", $"c_id".as("bucket"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    probes.join(assign, Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .join(e, Seq("vec_id"))
      .select($"q_id", $"vec_id",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
      .distinct()
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter($"rnk" <= 5)
      .select($"q_id", $"rnk", $"vec_id", $"cos_sim")
  }

  // --- X3m': filtered-ANN selectivity audit --------------------------------
  /** The adaptive-depth rule AS DATA: one audit row per predicate tier —
    * `label = 1` (~10% selectivity) and `label >= 5` (~50%) — carrying
    * the measured match count, selectivity in ppm, the CHOSEN nprobe,
    * and integer-ppm recall@5 against that predicate's filtered-brute
    * truth. At ~10% the parity rule saturates the clamp (nprobe = K =
    * all lists), which makes the search exact brute-over-matching —
    * recall is provably 1.0 and ExtSpec pins it as an equality; at ~50%
    * the rule picks an intermediate depth (≈ ceil(base/s) < K) and the
    * recall bar is the plain-IVF 60%. The row is the evidence the depth
    * tracks the predicate, not a constant.
    *
    * Scale: both legs share the memoized trained index; each adds one
    * tiny selectivity aggregate (broadcast), the filtered list join, and
    * the per-query top-5 window over probed candidates only. The truth
    * legs are each a brute pass over the MATCHING subset (s·|corpus| per
    * query) — the audit's intentional cost, same class as
    * [[bruteTruth]]. */
  def knnFilteredAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = quantized(s, dir)
    val lab = Tables.embeddings(s, dir).select($"vec_id", $"label")
    val ranked = rankedAssign(s, dir)
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)

    def leg(tag: String, pred: org.apache.spark.sql.Column): DataFrame = {
      val sel = lab.agg(count(lit(1)).as("n_total"),
          count(when(pred, 1)).as("n_match"))
        .selectExpr("n_match", "(1000000 * n_match) div n_total AS sel_ppm",
          s"${adaptiveNprobeExpr("div")} AS nprobe")
      val matchIds = lab.filter(pred).select($"vec_id")
      val assign = ranked.filter($"crn" === 1).join(matchIds, Seq("vec_id"))
        .select($"vec_id", $"c_id".as("bucket"))
      val probes = ranked.filter($"vec_id" < 20)
        .crossJoin(broadcast(sel.select($"nprobe")))
        .filter($"crn" <= $"nprobe")
        .select($"vec_id", $"c_id".as("bucket"))
        .join(e, Seq("vec_id"))
        .select($"vec_id".as("q_id"), $"qe".as("q_emb"), $"nrm".as("q_nrm"),
          $"bucket")
      val pairs = probes.join(assign, Seq("bucket"))
        .filter($"vec_id" =!= $"q_id")
        .join(e, Seq("vec_id"))
        .select($"q_id", $"vec_id",
          cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
        .distinct()
        .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 5)
        .select($"q_id", $"vec_id")
      val qs = e.filter($"vec_id" < 20).toDF("q_id", "q_emb", "q_nrm")
      val truth = e.join(matchIds, Seq("vec_id"))
        .join(broadcast(qs), $"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id",
          cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
        .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 5)
        .select($"q_id", $"vec_id")
      val stats = pairs
        .join(truth.withColumn("hit", lit(1L)), Seq("q_id", "vec_id"), "left")
        .agg(count(lit(1)).as("n_pred"), sum(coalesce($"hit", lit(0L))).as("hits"))
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      stats.crossJoin(broadcast(nT)).crossJoin(broadcast(sel))
        .select(lit(tag).as("pred"), $"n_match", $"sel_ppm", $"nprobe",
          $"n_pred", $"hits",
          expr("(1000000 * hits) div n_truth").as("recall_ppm"))
    }
    leg("label_eq_1", $"label" === 1)
      .unionByName(leg("label_ge_5", $"label" >= 5))
      .orderBy($"pred")
  }

  /** DuckDB mirror of [[knnFilteredAudit]]: the shared k-means chain,
    * then per predicate a (selectivity, nprobe) CTE pair, the filtered
    * probe pipeline, and that predicate's filtered-brute truth. */
  lazy val knnFilteredAuditSql: String = {
    def legSql(tag: String, predSql: String): String =
      s"""sel_$tag AS (
         |  SELECT COUNT(*) AS n_total,
         |    COUNT(*) FILTER (WHERE $predSql) AS n_match
         |  FROM embeddings),
         |np_$tag AS (
         |  SELECT n_match, (1000000 * n_match) // n_total AS sel_ppm,
         |    ${adaptiveNprobeExpr("//")} AS nprobe
         |  FROM sel_$tag),
         |match_$tag AS (SELECT vec_id FROM embeddings WHERE $predSql),
         |assign_$tag AS (
         |  SELECT r.vec_id, r.c_id AS bucket FROM aranked3 r
         |  JOIN match_$tag m ON r.vec_id = m.vec_id
         |  WHERE r.crn = 1),
         |probes_$tag AS (
         |  SELECT vec_id AS q_id, c_id AS bucket FROM aranked3, np_$tag
         |  WHERE vec_id < 20 AND crn <= np_$tag.nprobe),
         |cands_$tag AS (
         |  SELECT DISTINCT p.q_id, a.vec_id
         |  FROM probes_$tag p JOIN assign_$tag a ON p.bucket = a.bucket
         |  WHERE a.vec_id <> p.q_id),
         |scored_$tag AS (
         |  SELECT ca.q_id, ca.vec_id,
         |    CAST(${dotSql("q.embedding", "v.embedding")} AS DOUBLE)
         |      / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
         |  FROM cands_$tag ca
         |  JOIN embeddings q ON ca.q_id = q.vec_id
         |  JOIN embeddings v ON ca.vec_id = v.vec_id
         |  JOIN norms qn ON ca.q_id = qn.vec_id
         |  JOIN norms vn ON ca.vec_id = vn.vec_id, $idxSql
         |  GROUP BY ca.q_id, ca.vec_id, qn.nrm, vn.nrm),
         |p_$tag AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
         |    FROM scored_$tag) WHERE rnk <= 5),
         |tdots_$tag AS (
         |  SELECT q.vec_id AS q_id, v.vec_id AS vec_id,
         |    ${dotSql("q.embedding", "v.embedding")} AS dot
         |  FROM embeddings q
         |  JOIN embeddings v ON q.vec_id <> v.vec_id
         |    AND v.vec_id IN (SELECT vec_id FROM match_$tag), $idxSql
         |  WHERE q.vec_id < 20
         |  GROUP BY 1, 2),
         |tsc_$tag AS (
         |  SELECT q_id, tdots_$tag.vec_id AS vec_id,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
         |  FROM tdots_$tag
         |  JOIN norms qn ON q_id = qn.vec_id
         |  JOIN norms vn ON tdots_$tag.vec_id = vn.vec_id),
         |truth_$tag AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
         |    FROM tsc_$tag) WHERE rnk <= 5)""".stripMargin
    def statSql(tag: String): String =
      s"SELECT '$tag' AS pred,\n" +
        s"  (SELECT n_match FROM np_$tag) AS n_match,\n" +
        s"  (SELECT sel_ppm FROM np_$tag) AS sel_ppm,\n" +
        s"  (SELECT nprobe FROM np_$tag) AS nprobe,\n" +
        s"  (SELECT COUNT(*) FROM p_$tag) AS n_pred,\n" +
        s"  (SELECT COUNT(*) FROM p_$tag p JOIN truth_$tag t" +
        " ON p.q_id = t.q_id AND p.vec_id = t.vec_id) AS hits,\n" +
        s"  (1000000 * (SELECT COUNT(*) FROM p_$tag p JOIN truth_$tag t" +
        " ON p.q_id = t.q_id AND p.vec_id = t.vec_id))" +
        s" // (SELECT COUNT(*) FROM truth_$tag) AS recall_ppm"
    s"WITH $kmeansCtesSql,\n" +
      legSql("label_eq_1", "label = 1") + ",\n" +
      legSql("label_ge_5", "label >= 5") + "\n" +
      statSql("label_eq_1") + "\nUNION ALL\n" + statSql("label_ge_5") +
      "\nORDER BY pred"
  }

  /** DuckDB mirror of the k-means loop, unrolled: centroids live in long
    * (c_id, g, m) form; each round is one assignment CTE + one floor-div
    * means CTE ([[floorDivSql]] — true floor, matching [[floorDivMean]];
    * bare `//` truncates and drifts on negative sums). Ends at
    * `aranked3` (the post-training assignment ranking), which both the
    * ANN and the semantic-dedup oracles consume. */
  private val kmeansCtesSql: String = kmeansChainSql()

  /** The k-means chain parameterized like the BPE chain builder: `sfx`
    * renames every CTE so one statement can unroll SEVERAL independent
    * trainings; `whereVecs` restricts the training corpus (the centroid
    * drift audit trains per cohort). Defaults reproduce the original
    * unsuffixed chain verbatim. */
  private def kmeansChainSql(sfx: String = "",
      whereVecs: String = "TRUE"): String = {
    def assignCte(cents: String, n: Int): String =
      s"""adots$sfx$n AS (
         |  SELECT v.vec_id, c.c_id, SUM(v.qv * c.m) AS dot
         |  FROM vq$sfx v JOIN $cents c ON v.g = c.g
         |  GROUP BY 1, 2),
         |aranked$sfx$n AS (
         |  SELECT d.vec_id, d.c_id,
         |    row_number() OVER (PARTITION BY d.vec_id ORDER BY
         |      CAST(d.dot AS DOUBLE) / (sqrt(CAST(vn.nrm AS DOUBLE)) *
         |        sqrt(CAST(cn.cnrm AS DOUBLE))) DESC, d.c_id ASC) AS crn
         |  FROM adots$sfx$n d
         |  JOIN norms$sfx vn ON d.vec_id = vn.vec_id
         |  JOIN ${cents}_norm cn ON d.c_id = cn.c_id)""".stripMargin
    def meansCte(prev: Int, out: String): String =
      s"""$out AS (
         |  SELECT a.c_id, v.g, ${floorDivSql("SUM(v.qv)", "COUNT(*)")} AS m
         |  FROM aranked$sfx$prev a JOIN vq$sfx v ON a.vec_id = v.vec_id
         |  WHERE a.crn = 1
         |  GROUP BY 1, 2),
         |${out}_norm AS (
         |  SELECT c_id, SUM(m * m) AS cnrm FROM $out GROUP BY c_id)""".stripMargin
    val normsSfx =
      if (sfx.isEmpty && whereVecs == "TRUE") normsCte
      else s"""norms$sfx AS (
        |  SELECT vec_id, ${dotSql("embedding", "embedding")} AS nrm
        |  FROM (SELECT * FROM embeddings WHERE $whereVecs) embeddings, $idxSql
        |  GROUP BY vec_id)""".stripMargin
    s"""$normsSfx,
       |vq$sfx AS (
       |  SELECT vec_id, i.g AS g, ${q6Sql("embedding[i.g]")} AS qv
       |  FROM (SELECT * FROM embeddings WHERE $whereVecs) embeddings, $idxSql),
       |cent_ids$sfx AS (
       |  SELECT vec_id FROM embeddings WHERE $whereVecs
       |  ORDER BY md5('ivf_' || CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT (SELECT ${ivfKSql("COUNT(*)")}
       |         FROM embeddings WHERE $whereVecs)),
       |c0$sfx AS (
       |  SELECT v.vec_id AS c_id, v.g, v.qv AS m
       |  FROM vq$sfx v JOIN cent_ids$sfx ci ON v.vec_id = ci.vec_id),
       |c0${sfx}_norm AS (SELECT c_id, SUM(m * m) AS cnrm FROM c0$sfx GROUP BY c_id),
       |${assignCte(s"c0$sfx", 1)},
       |${meansCte(1, s"c1$sfx")},
       |${assignCte(s"c1$sfx", 2)},
       |${meansCte(2, s"c2$sfx")},
       |${assignCte(s"c2$sfx", 3)}""".stripMargin
  }

  val knnIvf2Sql: String =
    s"""WITH $kmeansCtesSql,
       |assign AS (SELECT vec_id, c_id AS bucket FROM aranked3 WHERE crn = 1),
       |probes AS (SELECT vec_id AS q_id, c_id AS bucket FROM aranked3
       |  WHERE vec_id < 20 AND crn <= $NPROBE2),
       |cands AS (
       |  SELECT DISTINCT p.q_id, a.vec_id
       |  FROM probes p JOIN assign a ON p.bucket = a.bucket
       |  WHERE a.vec_id <> p.q_id),
       |scored AS (
       |  SELECT ca.q_id, ca.vec_id,
       |    CAST(${dotSql("q.embedding", "v.embedding")} AS DOUBLE)
       |      / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
       |  FROM cands ca
       |  JOIN embeddings q ON ca.q_id = q.vec_id
       |  JOIN embeddings v ON ca.vec_id = v.vec_id
       |  JOIN norms qn ON ca.q_id = qn.vec_id
       |  JOIN norms vn ON ca.vec_id = vn.vec_id, $idxSql
       |  GROUP BY ca.q_id, ca.vec_id, qn.nrm, vn.nrm)
       |SELECT q_id, rnk, vec_id, cos_sim FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin

  // --- X2g: semantic (embedding-cosine) near-dup, centroid-blocked -------

  /** Expected block-size bound for the semantic-dedup blocker: when an
    * IVF list would exceed it (in expectation, corpus/K per list), the
    * blocker descends one more Voronoi level — see [[semDepth]]. */
  private[graft] val SEM_TARGET = 128L

  /** Depth cap: 6 levels bound blocks at ~[[SEM_TARGET]] up to
    * SEM_TARGET·K⁷ ≈ 3·10¹⁰ vectors — past any single-index corpus. */
  private[graft] val SEM_MAX_DEPTH = 6

  /** Smallest d ∈ [0, [[SEM_MAX_DEPTH]]] with n ≤ SEM_TARGET·K^(d+1):
    * each extra level refines every block by the next-nearest-centroid
    * rank (~K-way), so expected block size stays ≤ SEM_TARGET and total
    * pair expansion stays ~n·SEM_TARGET/2 — LINEAR in the corpus.
    * Integer-exact, mirrored verbatim by the CASE chain in
    * [[semDepthCaseSql]]. */
  private[graft] def semDepth(n: Long): Int = {
    // r20: the branching factor is the DYNAMIC centroid count. With
    // K = ceil(n/target) the top-level lists are already ≤ target in
    // expectation, so depth collapses to 0 or 1 past the fixed-K regime —
    // the general loop is kept (it is the documented contract and the
    // floor regime still exercises it). BigInt: K^(d+1) overflows Long
    // once K grows with n.
    val k = BigInt(ivfK(n))
    var d = 0
    var cap = BigInt(SEM_TARGET) * k
    while (d < SEM_MAX_DEPTH && BigInt(n) > cap) { d += 1; cap *= k }
    d
  }

  /** DuckDB mirror of [[semDepth]] as a CASE over `n` and the derived
    * centroid count `k` (both columns of the input row; HUGEINT products
    * because k^7 exceeds int64 once k tracks the corpus). */
  private def semDepthCaseSql: String = {
    val whens = (0 until SEM_MAX_DEPTH).map { d =>
      val pow = (0 to d).map(_ => "k").mkString(" * ")
      s"WHEN n <= CAST($SEM_TARGET AS HUGEINT) * $pow THEN $d"
    }.mkString(" ")
    s"CASE $whens ELSE $SEM_MAX_DEPTH END"
  }

  /** Label-FREE embedding near-dup detection — the production complement
    * of [[nearDupByLabel]]: when no blocking label exists, block by the
    * LEARNED k-means index the ANN tier already maintains and surface the
    * top-5 most-similar pairs per IVF list. Round 19 made the blocker
    * HIERARCHICAL: a list is subdivided by each member's ranked
    * next-nearest centroids (crn = 2 .. depth+1 from [[rankedAssign]] —
    * one more Voronoi level per depth step), with depth chosen by corpus
    * size so expected block size stays ≤ [[SEM_TARGET]]. The r18 10×
    * scale sweep measured the flat variant at 12.1× wall for 10× data —
    * in-list pair expansion is quadratic under a fixed K; the hierarchy
    * makes total pair work ~n·SEM_TARGET/2, linear in n, and costs ZERO
    * extra corpus passes (the crn ranking is already materialized for
    * the nprobe path). Blocking one Voronoi level down is the same
    * approximation the operator already makes at the top level (pairs
    * split across PRIMARY lists are out of contract), and exact
    * duplicates can never split: identical vectors have identical
    * centroid cosines, hence identical rank tuples.
    *
    * Determinism: centroids, assignments, and cosines are the exact
    * integer/IEEE pipeline of [[knnIvf2]]; the rank tuple tie-breaks on
    * centroid id inside [[kmAssign]]; ranks tie-break on the pair ids. */
  def semanticDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = quantized(s, dir)
    val ranked = rankedAssign(s, dir)
    val assign = ranked.filter($"crn" === 1)
      .select($"vec_id", $"c_id".as("bucket"))
    val depth = semDepth(embCount(s, dir))
    val v0 = e.join(assign, Seq("vec_id"))
    val v =
      if (depth == 0) v0.withColumn("sub", lit(""))
      else {
        val subKeys = ranked.filter($"crn".between(2, depth + 1))
          .groupBy($"vec_id")
          .agg(concat_ws("_",
            transform(array_sort(collect_list(struct($"crn", $"c_id"))),
              x => x.getField("c_id").cast(StringType))).as("sub"))
        v0.join(subKeys, Seq("vec_id"))
      }
    val b = v.toDF("b_id", "b_emb", "b_nrm", "bucket", "sub")
    val scored = v.join(b, Seq("bucket", "sub"))
      .filter($"vec_id" < $"b_id")
      .select($"bucket", $"vec_id", $"b_id",
        cosine(dotQ($"qe", $"b_emb"), $"nrm", $"b_nrm").as("cos_sim"))
    val w = Window.partitionBy($"bucket")
      .orderBy($"cos_sim".desc, $"vec_id".asc, $"b_id".asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter($"rnk" <= 5)
      .orderBy($"bucket", $"rnk")
      .select($"bucket", $"rnk", $"vec_id", $"b_id", $"cos_sim")
  }

  val semanticDedupSql: String =
    s"""WITH $kmeansCtesSql,
       |assign AS (SELECT vec_id, c_id AS bucket FROM aranked3 WHERE crn = 1),
       |dsem AS (SELECT $semDepthCaseSql AS d
       |  FROM (SELECT n, ${ivfKSql("n")} AS k
       |        FROM (SELECT COUNT(*) AS n FROM embeddings))),
       |subk AS (
       |  SELECT r.vec_id,
       |    COALESCE(STRING_AGG(CAST(r.c_id AS VARCHAR), '_' ORDER BY r.crn)
       |      FILTER (WHERE r.crn BETWEEN 2 AND ds.d + 1), '') AS sub
       |  FROM aranked3 r, dsem ds
       |  GROUP BY r.vec_id),
       |dots AS (
       |  SELECT av.bucket, a.vec_id, b.vec_id AS b_id,
       |    ${dotSql("a.embedding", "b.embedding")} AS dot
       |  FROM assign av
       |  JOIN subk sa ON av.vec_id = sa.vec_id
       |  JOIN embeddings a ON av.vec_id = a.vec_id
       |  JOIN assign bv ON av.bucket = bv.bucket
       |  JOIN subk sb ON bv.vec_id = sb.vec_id AND sa.sub = sb.sub
       |  JOIN embeddings b ON bv.vec_id = b.vec_id
       |    AND a.vec_id < b.vec_id, $idxSql
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT bucket, dots.vec_id AS vec_id, b_id,
       |    CAST(dot AS DOUBLE)
       |      / (sqrt(CAST(an.nrm AS DOUBLE)) * sqrt(CAST(bn.nrm AS DOUBLE))) AS cos_sim
       |  FROM dots
       |  JOIN norms an ON dots.vec_id = an.vec_id
       |  JOIN norms bn ON b_id = bn.vec_id)
       |SELECT bucket, rnk, vec_id, b_id, cos_sim FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY bucket ORDER BY cos_sim DESC, vec_id ASC, b_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= 5
       |ORDER BY bucket, rnk""".stripMargin

  // --- X3b'': scalar-quantized (SQ8) ANN — the bandwidth path ------------
  /** Candidates surviving the int8 scan per query, before exact re-rank. */
  private val SQ_C = 20

  /** SQ8 two-tier ANN: each embedding compresses to an int8 code vector
    * (symmetric per-vector quantization: code_i = floor(x_i / max|x| ·
    * 127)), the corpus scan ranks candidates by integer code-dot cosine,
    * and only the top-[[SQ_C]] per query are re-ranked with the exact
    * quantized-decimal cosine. At 100 TB this is the memory-bandwidth
    * play: the scan pass reads a 64-byte code column instead of 256-byte
    * floats (4× less I/O — and column pruning means the float column is
    * only fetched for the ≤ SQ_C·|Q| re-rank rows), with all arithmetic
    * in codegen'd integer ops. Every step is engine-deterministic:
    * max/division/floor are IEEE-exact, so both engines derive identical
    * codes, identical integer dots, and identical final doubles. */
  def knnSq8(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // codes via the codegen'd Sq8Code expression — one generated loop
    // instead of two interpreted HOF transforms on the corpus hot path
    val base = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding",
        graft.functions.Sq8Code.sq8Code($"embedding").as("code"))
      .withColumn("cn", dotQ($"code", $"code"))
    val q = base
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
        $"code".as("q_code"), $"cn".as("q_cn"))
      .filter($"q_id" < 20)
    val wc = Window.partitionBy($"q_id").orderBy($"acos".desc, $"vec_id".asc)
    val cands = base.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", $"q_emb", $"embedding",
        cosine(dotQ($"q_code", $"code"), $"q_cn", $"cn").as("acos"))
      .withColumn("crn", row_number().over(wc))
      .filter($"crn" <= SQ_C)
    val scored = cands.select($"q_id", $"vec_id",
      cosine(decDot($"q_emb", $"embedding"),
        decDot($"q_emb", $"q_emb"),
        decDot($"embedding", $"embedding")).as("cos_sim"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter($"rnk" <= 5)
      .orderBy($"q_id", $"rnk")
      .select($"q_id", $"rnk", $"vec_id", $"cos_sim")
  }

  /** DuckDB mirror of the SQ8 code: floor(x / sc * 127) as BIGINT. */
  private def sq8Sql(x: String, sc: String): String =
    s"CAST(floor(CAST($x AS DOUBLE) / $sc * 127) AS BIGINT)"

  val knnSq8Sql: String =
    s"""WITH $normsCte,
       |scales AS (
       |  SELECT vec_id, CASE WHEN mx = 0 THEN 1 ELSE mx END AS sc FROM (
       |    SELECT vec_id, MAX(abs(CAST(embedding[i.g] AS DOUBLE))) AS mx
       |    FROM embeddings, $idxSql GROUP BY vec_id)),
       |cnorms AS (
       |  SELECT e.vec_id,
       |    CAST(SUM(${sq8Sql("embedding[i.g]", "sc")} *
       |             ${sq8Sql("embedding[i.g]", "sc")}) AS BIGINT) AS cn
       |  FROM embeddings e JOIN scales USING (vec_id), $idxSql
       |  GROUP BY e.vec_id),
       |cdots AS (
       |  SELECT q.vec_id AS q_id, v.vec_id AS vec_id,
       |    CAST(SUM(${sq8Sql("q.embedding[i.g]", "qs.sc")} *
       |             ${sq8Sql("v.embedding[i.g]", "vs.sc")}) AS BIGINT) AS cdot
       |  FROM embeddings q
       |  JOIN scales qs ON q.vec_id = qs.vec_id
       |  JOIN embeddings v ON q.vec_id <> v.vec_id
       |  JOIN scales vs ON v.vec_id = vs.vec_id, $idxSql
       |  WHERE q.vec_id < 20
       |  GROUP BY 1, 2),
       |acands AS (
       |  SELECT q_id, cdots.vec_id AS vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      CAST(cdot AS DOUBLE) / (sqrt(CAST(qc.cn AS DOUBLE)) *
       |        sqrt(CAST(vc.cn AS DOUBLE))) DESC,
       |      cdots.vec_id ASC) AS crn
       |  FROM cdots
       |  JOIN cnorms qc ON q_id = qc.vec_id
       |  JOIN cnorms vc ON cdots.vec_id = vc.vec_id),
       |cands AS (SELECT q_id, vec_id FROM acands WHERE crn <= $SQ_C),
       |exact AS (
       |  SELECT c.q_id, c.vec_id,
       |    ${dotSql("q.embedding", "v.embedding")} AS dot
       |  FROM cands c
       |  JOIN embeddings q ON c.q_id = q.vec_id
       |  JOIN embeddings v ON c.vec_id = v.vec_id, $idxSql
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT q_id, exact.vec_id AS vec_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn.nrm AS DOUBLE)) *
       |      sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
       |  FROM exact
       |  JOIN norms qn ON q_id = qn.vec_id
       |  JOIN norms vn ON exact.vec_id = vn.vec_id)
       |SELECT q_id, rnk, vec_id, cos_sim FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin

  // --- X3d: per-dimension feature statistics (the scaling fit) -----------
  /** Per-dimension n/mean/std/min/max over the embedding corpus — the
    * "fit" half of feature standardization (z-score scaling), the step an
    * ML pipeline runs before normalizing vectors for training or ANN
    * indexing. One posexplode + one hash aggregate; at 100 TB this is a
    * single map-side-combined pass (64 groups, constant reducer state).
    * Determinism: moments come from EXACT integer sums of the q6-quantized
    * components (Σq and Σq² accumulate as DECIMAL(38,0), order-immune);
    * mean/std are then double arithmetic over those exact values with the
    * expression order mirrored in the oracle, and IEEE sqrt is correctly
    * rounded — identical doubles on both engines, no rounding needed. */
  def embedDimStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Tables.embeddings(s, dir)
      .select(posexplode($"embedding").as(Seq("dim", "v")))
      .select($"dim".cast(LongType).as("dim"), $"v",
        floor($"v".cast(DoubleType) * 1000000L).as("qv"))
    q.groupBy($"dim")
      .agg(
        count(lit(1)).as("n"),
        sum($"qv".cast(DecimalType(38, 0))).as("sq"),
        sum(($"qv" * $"qv").cast(DecimalType(38, 0))).as("sqq"),
        min($"v".cast(DoubleType)).as("vmin"),
        max($"v".cast(DoubleType)).as("vmax"))
      .select($"dim", $"n",
        ($"sq".cast(DoubleType) / $"n" / 1000000.0).as("mean"),
        (sqrt(($"sqq".cast(DoubleType) -
          $"sq".cast(DoubleType) * $"sq".cast(DoubleType) / $"n") /
          ($"n" - 1)) / 1000000.0).as("std"),
        $"vmin", $"vmax")
      .orderBy($"dim")
  }

  val embedDimStatsSql: String =
    s"""WITH q AS (
       |  SELECT CAST(i.g - 1 AS BIGINT) AS dim,
       |    CAST(embedding[i.g] AS DOUBLE) AS v,
       |    ${q6Sql("embedding[i.g]")} AS qv
       |  FROM embeddings, $idxSql),
       |m AS (
       |  SELECT dim, COUNT(*) AS n,
       |    CAST(SUM(CAST(qv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq,
       |    CAST(SUM(CAST(qv * qv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sqq,
       |    MIN(v) AS vmin, MAX(v) AS vmax
       |  FROM q GROUP BY dim)
       |SELECT dim, n,
       |  CAST(sq AS DOUBLE) / n / 1000000.0 AS mean,
       |  sqrt((CAST(sqq AS DOUBLE)
       |    - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n) / (n - 1))
       |    / 1000000.0 AS std,
       |  vmin, vmax
       |FROM m ORDER BY dim""".stripMargin

  // --- X3d': apply the z-score fit (the transform half) ------------------
  /** Standardize each embedding with the corpus fit from
    * [[embedDimStats]]: z_i = (v_i − mean_i) / std_i. The fit (64 rows)
    * broadcasts; the transform is one narrow pass — the exact shape a
    * 100-TB normalize stage takes (fit once, broadcast, map). Emitted as
    * an order-immune summary per vector (quantized-z integer sum + exact
    * extremes) because a raw double sum over vector components would be
    * summation-order-dependent in the oracle engine. */
  def embedNormalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fit = embedDimStats(s, dir).select($"dim", $"mean", $"std")
    val z = Tables.embeddings(s, dir)
      .filter($"vec_id" < 50)
      .select($"vec_id", posexplode($"embedding").as(Seq("dim", "v")))
      .select($"vec_id", $"dim".cast(LongType).as("dim"), $"v")
      .join(broadcast(fit), Seq("dim"))
      .select($"vec_id",
        (($"v".cast(DoubleType) - $"mean") / $"std").as("z"))
    z.groupBy($"vec_id")
      .agg(
        count(lit(1)).as("n_dims"),
        sum(floor($"z" * 1000000L).cast(DecimalType(38, 0)))
          .cast(LongType).as("sum_zq"),
        min($"z").as("z_min"),
        max($"z").as("z_max"))
      .orderBy($"vec_id")
  }

  val embedNormalizeSql: String =
    s"""WITH q AS (
       |  SELECT CAST(i.g - 1 AS BIGINT) AS dim,
       |    CAST(embedding[i.g] AS DOUBLE) AS v,
       |    ${q6Sql("embedding[i.g]")} AS qv,
       |    vec_id
       |  FROM embeddings, $idxSql),
       |m AS (
       |  SELECT dim, COUNT(*) AS n,
       |    CAST(SUM(CAST(qv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq,
       |    CAST(SUM(CAST(qv * qv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sqq
       |  FROM q GROUP BY dim),
       |fit AS (
       |  SELECT dim,
       |    CAST(sq AS DOUBLE) / n / 1000000.0 AS mean,
       |    sqrt((CAST(sqq AS DOUBLE)
       |      - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n) / (n - 1))
       |      / 1000000.0 AS std
       |  FROM m),
       |z AS (
       |  SELECT q.vec_id, (q.v - f.mean) / f.std AS z
       |  FROM q JOIN fit f ON q.dim = f.dim
       |  WHERE q.vec_id < 50)
       |SELECT vec_id, COUNT(*) AS n_dims,
       |  CAST(CAST(SUM(CAST(floor(z * 1000000) AS DECIMAL(38,0)))
       |    AS DECIMAL(38,0)) AS BIGINT) AS sum_zq,
       |  MIN(z) AS z_min, MAX(z) AS z_max
       |FROM z GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // --- X3c / X2: (label, LSH-bucket)-blocked embedding near-dup ----------
  /** Top-3 most-similar pairs within each label — the embedding-cosine
    * near-dup detector. Candidates are blocked on (label, hyperplane-LSH
    * bucket), composing [[bucketCol]] with the label block: a per-label
    * all-pairs join is O(block²) and becomes the quadratic scale-killer when
    * labels are few, whereas (label, bucket) candidates stay an equi-join
    * whose bucket fan-out is tunable by PLANES. Near-dups have cos≈1, so
    * they land in the same bucket with high probability — exactly the LSH
    * contract — and the exact cosine re-rank below keeps only true pairs. */
  def nearDupByLabel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select($"label", $"vec_id", q6Arr($"embedding").as("qe"))
      .select($"label", $"vec_id", $"qe", dotQ($"qe", $"qe").as("nrm"),
        bucketCol($"qe").as("bucket"))
    val b = e.toDF("b_label", "b_id", "b_emb", "b_nrm", "b_bucket")
    val scored = e.join(b,
        $"label" === $"b_label" && $"bucket" === $"b_bucket" && $"vec_id" < $"b_id")
      .select($"label", $"vec_id", $"b_id",
        cosine(dotQ($"qe", $"b_emb"), $"nrm", $"b_nrm").as("cos_sim"))
    val w = Window.partitionBy($"label").orderBy($"cos_sim".desc, $"vec_id".asc, $"b_id".asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter($"rnk" <= 3)
      .orderBy($"label", $"rnk")
      .select($"label", $"rnk", $"vec_id", $"b_id", $"cos_sim")
  }

  val nearDupByLabelSql: String =
    s"""WITH $normsCte,
       |$bucketsCte,
       |dots AS (
       |  SELECT a.label, a.vec_id AS vec_id, b.vec_id AS b_id,
       |    ${dotSql("a.embedding", "b.embedding")} AS dot
       |  FROM embeddings a
       |  JOIN buckets ab ON a.vec_id = ab.vec_id
       |  JOIN buckets bb ON ab.bucket = bb.bucket
       |  JOIN embeddings b
       |    ON b.vec_id = bb.vec_id AND a.label = b.label
       |    AND a.vec_id < b.vec_id, $idxSql
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT label, dots.vec_id AS vec_id, b_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(an.nrm AS DOUBLE)) * sqrt(CAST(bn.nrm AS DOUBLE))) AS cos_sim
       |  FROM dots
       |  JOIN norms an ON dots.vec_id = an.vec_id
       |  JOIN norms bn ON b_id = bn.vec_id)
       |SELECT label, rnk, vec_id, b_id, cos_sim FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY label ORDER BY cos_sim DESC, vec_id ASC, b_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= 3
       |ORDER BY label, rnk""".stripMargin

  // --- X3h: product-quantization ANN (ADC scan + exact re-rank) ----------

  /** PQ geometry: 64 dims → 8 subspaces × 8 dims, 16 codewords each, so a
    * vector's code is 8 nibbles (vs 64 longs) — the 100-TB memory story:
    * the candidate scan touches only the code table and a per-query 8×16
    * lookup table; full vectors are read for just the C re-rank rows.
    * Finer geometry than the classic 4×16: on near-random unit vectors
    * (this corpus) coarse sub-quantizers rank candidates barely above
    * chance; 8 subspaces halve the per-subspace variance the codebook
    * must cover. */
  private[graft] val PQ_M = 8
  private[graft] val PQ_SUB = DIM / PQ_M
  private[graft] val PQ_K = 16
  private val PQ_C = 20

  /** Lloyd rounds for the per-subspace codebooks. Random (md5-seeded)
    * codewords give ~25% top-5 recall on this data; two refinement rounds
    * lift the ADC ranking to a usable frontier — PQ quality IS the
    * codebook fit. */
  private val PQ_ROUNDS = 2

  /** md5-seeded per-subspace codebook: the [[PQ_K]] md5-ranked seed
    * vectors each contribute their m-th subvector as codeword (m, cid). */
  private def pqSeed(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val h = md5(concat(lit("pq_"), $"vec_id".cast(StringType)))
    val seed = e.withColumn("h", h).orderBy($"h".asc, $"vec_id".asc)
      .limit(PQ_K)
      .withColumn("cid",
        (row_number().over(Window.orderBy($"h".asc, $"vec_id".asc)) - 1)
          .cast(LongType))
    seed.select($"cid", posexplode(expr(
      s"transform(sequence(0, ${PQ_M - 1}), m -> slice(qe, m * $PQ_SUB + 1, $PQ_SUB))"))
      .as(Seq("m", "cw")))
      .select($"m".cast(LongType).as("m"), $"cid", $"cw")
  }

  /** Encode pass: nearest codeword per (vector, subspace) by exact integer
    * L2, ties on cid — one corpus pass against the broadcast codebook. */
  private[graft] def pqEncode(e: DataFrame, cb: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val sv = expr(s"slice(qe, m * $PQ_SUB + 1, $PQ_SUB)")
    val diff = zip_with(sv, $"cw", (x, y) => x - y)
    e.join(broadcast(cb), lit(true))
      .select($"vec_id", $"m", $"cid", dotQ(diff, diff).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id", $"m").orderBy($"d2".asc, $"cid".asc)))
      .where($"rn" === 1).select($"vec_id", $"m", $"cid")
  }

  /** Update pass: per-(subspace, codeword) integer floor-div means — the
    * same order-immune arithmetic as [[kmUpdate]], per subspace. Empty
    * codewords drop out (deterministically in both engines). */
  private def pqUpdate(e: DataFrame, codes: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.join(codes, Seq("vec_id"))
      .select($"m", $"cid", posexplode(
        expr(s"slice(qe, m * $PQ_SUB + 1, $PQ_SUB)")).as(Seq("j", "qv")))
      .groupBy($"m", $"cid", $"j")
      .agg(sum($"qv").as("sq"), count(lit(1)).as("n"))
      .select($"m", $"cid", $"j", floorDivMean($"sq", $"n").as("mj"))
      .groupBy($"m", $"cid")
      .agg(transform(array_sort(collect_list(struct($"j", $"mj"))),
        x => x.getField("mj")).as("cw"))
      .transform(graft.GraftSession.ckpt(_))
  }

  /** Seed + [[PQ_ROUNDS]] Lloyd-refined per-subspace codebooks. */
  private[graft] def pqCodebook(e: DataFrame): DataFrame =
    (1 to PQ_ROUNDS).foldLeft(pqSeed(e)) { (cb, _) =>
      pqUpdate(e, pqEncode(e, cb))
    }

  /** The identity-layout trained codebook, memoized per (session,
    * embeddings content) like [[rankedAssign]]: `q_sim_knn_pq` and the
    * identity arm of the `q_ann_opq` permutation audit train it ONCE per
    * session — a real deployment ships the codebook as an artifact. */
  private[graft] def pqCodebookMemo(s: SparkSession, dir: String): DataFrame =
    pqCbMemo(s, dir, "", quantized(s, dir))

  /** The encoded corpus (vec_id, m, cid — [[PQ_M]] nibble codes per
    * vector) under the identity layout, memoized: the code table is the
    * second index artifact a PQ deployment ships (computed at ingest),
    * shared by `q_sim_knn_pq`'s scan and the IVF-PQ composition. */
  private def pqCodesMemo(s: SparkSession, dir: String): DataFrame =
    pqCodesTagMemo(s, dir, "", quantized(s, dir), pqCodebookMemo(s, dir))

  /** Layout-tagged PQ artifact memos: every layout (identity or a
    * permuted OPQ arm) trains its codebook and encodes the corpus ONCE
    * per (session, embeddings content) — each arm is a deterministic
    * index artifact, so retraining it per consumer or per bench pass
    * would be the same waste [[rankedAssign]] eliminates for IVF. */
  private def pqCbMemo(s: SparkSession, dir: String, tag: String,
      e: => DataFrame): DataFrame =
    graft.GraftSession.memo(s, s"pq_cb$tag|" +
        graft.GraftSession.contentKey(dir, Seq("embeddings"))) {
      graft.GraftSession.ckpt(pqCodebook(e))
    }

  private def pqCodesTagMemo(s: SparkSession, dir: String, tag: String,
      e: => DataFrame, cb: => DataFrame): DataFrame =
    graft.GraftSession.memo(s, s"pq_codes$tag|" +
        graft.GraftSession.contentKey(dir, Seq("embeddings"))) {
      graft.GraftSession.ckpt(pqEncode(e, cb))
    }

  /** Product-quantization ANN: encode every vector as [[PQ_M]] nearest-
    * codeword ids (exact integer L2, ties on cid), score candidates by
    * asymmetric distance computation — the query's 4×8 partial-dot lookup
    * table joined to the code table and summed — then re-rank the top
    * [[PQ_C]] candidates per query with the exact integer cosine. ADC
    * ranking normalizes by the candidate's true norm (query norm is
    * constant within a partition), tie-broken on vec_id.
    *
    * Scale: encode is one corpus pass against a broadcast 32-row codebook
    * (same bounded-BNLJ class as the IVF assignment); the ADC scan is an
    * equi-join on (m, cid) + one hash aggregate — per query it reads 4
    * ints per corpus vector instead of 64 longs, which is the point of
    * PQ; only C×|Q| rows ever touch full vectors again. */
  def knnPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = quantized(s, dir)
    val adc = pqCodesMemo(s, dir)
      .join(pqLut(e, pqCodebookMemo(s, dir)), Seq("m", "cid"))
      .where($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id").agg(sum($"part").as("adc_dot"))
    exactTop5(adcTopC(adc, e), e)
  }

  /** The PQ pipeline over an arbitrary (vec_id, qe, nrm) layout and its
    * trained codebook — shared by `q_sim_knn_pq` (identity layout,
    * memoized codebook) and the `q_ann_opq` permutation-family audit
    * (each permuted layout trains its own). Inner products and norms are
    * permutation-invariant, so the exact re-rank is identical across
    * layouts; only the subspace split — what the codebooks must fit —
    * changes. */
  private def knnPqOn(e: DataFrame, cb: DataFrame, codes: DataFrame,
      rerankE: DataFrame = null): DataFrame = {
    import e.sparkSession.implicits._
    // Permuted layouts leave dots/norms bit-identical, so ranking off the
    // layout itself equals ranking off the original. The SCALED rotation
    // arm must rank and re-rank off the ORIGINAL layout instead (as its
    // oracle does): sqrt(2n) is not exactly sqrt(2)·sqrt(n) in IEEE, so
    // mixing scaled ADC dots with scaled norms would drift ulps from the
    // oracle's scaled-dot/original-norm arithmetic. Monotonicity is
    // unaffected either way — the scale is a per-query constant.
    val re = Option(rerankE).getOrElse(e)
    val adc = codes.join(pqLut(e, cb), Seq("m", "cid"))
      .where($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id").agg(sum($"part").as("adc_dot"))
    exactTop5(adcTopC(adc, re), re)
  }

  /** The per-query 8×16 partial-dot lookup table (ADC's query-side half). */
  private[graft] def pqLut(e: DataFrame, cb: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val sv = expr(s"slice(qe, m * $PQ_SUB + 1, $PQ_SUB)")
    e.where($"vec_id" < 20).join(broadcast(cb), lit(true))
      .select($"vec_id".as("q_id"), $"m", $"cid", dotQ(sv, $"cw").as("part"))
  }

  /** Keep the ADC-ranked top [[PQ_C]] candidates per query (norm-adjusted,
    * ties on vec_id). */
  private def adcTopC(adc: DataFrame, e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    adc.join(e.select($"vec_id", $"nrm"), Seq("vec_id"))
      .withColumn("rn", row_number().over(Window.partitionBy($"q_id")
        .orderBy(($"adc_dot".cast(DoubleType) / sqrt($"nrm".cast(DoubleType)))
          .desc, $"vec_id".asc)))
      .where($"rn" <= PQ_C).select($"q_id", $"vec_id")
  }

  /** Exact integer-cosine re-rank of a (q_id, vec_id) candidate relation
    * to the top-5 surface every ANN tier emits. Permutation-safe: dot
    * products and norms are layout-invariant. */
  private def exactTop5(cand: DataFrame, e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val q = e.where($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"qe".as("q_emb"), $"nrm".as("q_nrm"))
    val scored = cand.join(broadcast(q), Seq("q_id")).join(e, Seq("vec_id"))
      .select($"q_id", $"vec_id",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter($"rnk" <= 5)
      .orderBy($"q_id", $"rnk")
      .select($"q_id", $"rnk", $"vec_id", $"cos_sim")
  }

  /** X3l — the composed 100-TB ANN architecture (IVF-PQ / IndexIVFPQ
    * shape): the learned coarse quantizer PRUNES (queries see only their
    * [[NPROBE2]] nearest inverted lists — the memoized [[rankedAssign]]
    * index), PQ codes SCORE the surviving candidates by ADC (8 nibbles
    * per vector read instead of 64 longs — the memoized [[pqCodesMemo]]),
    * and the exact re-rank touches only the top [[PQ_C]]. Per query the
    * work is |corpus|·(nprobe/K) code reads + C full vectors — the
    * multiplicative composition of the IVF and PQ reductions, which is
    * the plan FAISS-class systems run at billion scale. Both index
    * artifacts are trained once per session and shared with their own
    * tiers (`q_sim_knn_ivf2`, `q_sim_knn_pq`). */
  def knnIvfPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = quantized(s, dir)
    val ranked = rankedAssign(s, dir)
    val assign = ranked.filter($"crn" === 1)
      .select($"vec_id", $"c_id".as("bucket"))
    val probes = ranked.filter($"vec_id" < 20 && $"crn" <= NPROBE2)
      .select($"vec_id".as("q_id"), $"c_id".as("bucket"))
    val cands = probes.join(assign, Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id").distinct()
    val adc = cands.join(pqCodesMemo(s, dir), Seq("vec_id"))
      .join(pqLut(e, pqCodebookMemo(s, dir)), Seq("q_id", "m", "cid"))
      .groupBy($"q_id", $"vec_id").agg(sum($"part").as("adc_dot"))
    exactTop5(adcTopC(adc, e), e)
  }

  /** One encode round in SQL: L2 to every codeword of cb$n, argmin. */
  private def pqEncCte(n: Int): String =
    s"""encd$n AS (
       |  SELECT v.vec_id, c.m, c.cid,
       |    CAST(list_sum(list_transform(range(1, ${PQ_SUB + 1}),
       |      j -> (v.qe[c.m * $PQ_SUB + j] - c.cw[j])
       |         * (v.qe[c.m * $PQ_SUB + j] - c.cw[j]))) AS BIGINT) AS d2
       |  FROM qv v CROSS JOIN cb$n c),
       |codes$n AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id, m ORDER BY d2 ASC, cid ASC) AS rn
       |    FROM encd$n) WHERE rn = 1)""".stripMargin

  /** One update round in SQL: floor-div means per (m, cid, j), reassembled
    * into list codewords ([[floorDivSql]] — true floor, matching
    * [[floorDivMean]]; bare `//` truncates on negative sums). */
  private def pqUpdCte(n: Int): String =
    s"""updd$n AS (
       |  SELECT cd.m, cd.cid, j.j,
       |    CAST(${floorDivSql(s"SUM(v.qe[cd.m * $PQ_SUB + j.j])", "COUNT(*)")}
       |      AS BIGINT) AS mj
       |  FROM codes${n - 1} cd JOIN qv v USING (vec_id),
       |    (SELECT unnest(range(1, ${PQ_SUB + 1})) AS j) j
       |  GROUP BY 1, 2, 3),
       |cb$n AS (
       |  SELECT m, cid, list(mj ORDER BY j) AS cw FROM updd$n GROUP BY 1, 2)""".stripMargin

  /** The identity vector layout: plain micro-unit quantization. */
  private val qvIdentitySql: String =
    """qv AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
      |  FROM embeddings)""".stripMargin

  /** Full PQ pipeline SQL over an injected qv CTE block (the vector
    * layout) — identity for [[knnPqSql]], variance-permuted chains for
    * [[annOpqSql]]. */
  /** PQ training + corpus codes + per-query LUT as a reusable CTE block
    * (ends at `lut`; codes live in `codes{PQ_ROUNDS}`): shared by the
    * full-scan PQ pipeline and the IVF-PQ composition. Does NOT define
    * `norms` — the enclosing WITH supplies it. */
  private def pqTrainCtesSql(qvBlock: String): String = {
    val training = (1 to PQ_ROUNDS)
      .map(r => s"${pqUpdCte(r)},\n${pqEncCte(r)}").mkString(",\n")
    s"""$qvBlock,
       |seedv AS (
       |  SELECT qe, ROW_NUMBER() OVER (ORDER BY
       |      md5('pq_' || CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cid
       |  FROM qv
       |  ORDER BY md5('pq_' || CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
       |  LIMIT $PQ_K),
       |cb0 AS (
       |  SELECT m.m, s.cid,
       |    s.qe[m.m * $PQ_SUB + 1 : m.m * $PQ_SUB + $PQ_SUB] AS cw
       |  FROM seedv s, (SELECT unnest(range(0, $PQ_M)) AS m) m),
       |${pqEncCte(0)},
       |$training,
       |lut AS (
       |  SELECT v.vec_id AS q_id, c.m, c.cid,
       |    CAST(list_sum(list_transform(range(1, ${PQ_SUB + 1}),
       |      j -> v.qe[c.m * $PQ_SUB + j] * c.cw[j])) AS BIGINT) AS part
       |  FROM qv v CROSS JOIN cb$PQ_ROUNDS c WHERE v.vec_id < 20)""".stripMargin
  }

  /** The ADC top-C → exact re-rank tail (consumes an `adc` CTE and
    * `norms`), ending in the top-5 SELECT every ANN tier emits. */
  private def pqRerankTailSql: String =
    s"""cand AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT a.q_id, a.vec_id, ROW_NUMBER() OVER (PARTITION BY a.q_id
       |      ORDER BY CAST(a.adc_dot AS DOUBLE) / sqrt(CAST(n.nrm AS DOUBLE))
       |        DESC, a.vec_id ASC) AS rn
       |    FROM adc a JOIN norms n ON a.vec_id = n.vec_id)
       |  WHERE rn <= $PQ_C),
       |ex AS (
       |  SELECT cd.q_id, cd.vec_id,
       |    ${dotSql("q.embedding", "v.embedding")} AS dot
       |  FROM cand cd
       |  JOIN embeddings q ON cd.q_id = q.vec_id
       |  JOIN embeddings v ON cd.vec_id = v.vec_id, $idxSql
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT ex.q_id, ex.vec_id,
       |    CAST(dot AS DOUBLE)
       |      / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
       |  FROM ex
       |  JOIN norms qn ON ex.q_id = qn.vec_id
       |  JOIN norms vn ON ex.vec_id = vn.vec_id)
       |SELECT q_id, rnk, vec_id, cos_sim FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin

  private def pqPipelineSql(qvBlock: String): String =
    s"""WITH $normsCte,
       |${pqTrainCtesSql(qvBlock)},
       |adc AS (
       |  SELECT l.q_id, cd.vec_id, CAST(SUM(l.part) AS BIGINT) AS adc_dot
       |  FROM codes$PQ_ROUNDS cd JOIN lut l ON cd.m = l.m AND cd.cid = l.cid
       |  WHERE cd.vec_id <> l.q_id GROUP BY 1, 2),
       |$pqRerankTailSql""".stripMargin

  val knnPqSql: String = pqPipelineSql(qvIdentitySql)

  /** DuckDB mirror of [[knnIvfPq]]: the unrolled k-means chain provides
    * the pruning index, the PQ chain provides codes + LUT, and the ADC
    * runs only over the probed candidate pairs. */
  val knnIvfPqSql: String =
    s"""WITH $kmeansCtesSql,
       |${pqTrainCtesSql(qvIdentitySql)},
       |assign AS (SELECT vec_id, c_id AS bucket FROM aranked3 WHERE crn = 1),
       |probes AS (SELECT vec_id AS q_id, c_id AS bucket FROM aranked3
       |  WHERE vec_id < 20 AND crn <= $NPROBE2),
       |cands AS (
       |  SELECT DISTINCT p.q_id, a.vec_id
       |  FROM probes p JOIN assign a ON p.bucket = a.bucket
       |  WHERE a.vec_id <> p.q_id),
       |adc AS (
       |  SELECT ca.q_id, ca.vec_id, CAST(SUM(l.part) AS BIGINT) AS adc_dot
       |  FROM cands ca
       |  JOIN codes$PQ_ROUNDS cd ON cd.vec_id = ca.vec_id
       |  JOIN lut l ON l.q_id = ca.q_id AND cd.m = l.m AND cd.cid = l.cid
       |  GROUP BY 1, 2),
       |$pqRerankTailSql""".stripMargin

  // --- X3i: unified ANN evaluation ---------------------------------------
  /** Recall@5 of every approximate tier against the SHARED brute-force
    * truth, in integer ppm — the `q_dedup_eval` discipline applied to the
    * ANN family: the audit row a real pipeline consults before choosing a
    * method/config, declared on the oracle surface instead of living only
    * in a spec.
    *
    * Semantics: truth = brute top-5 pairs (q_id, vec_id); per method,
    * n_pred = pairs returned, hits = pairs also in truth, recall_ppm =
    * (1e6 · hits) div |truth| — all integer-exact, so the hash pins it.
    *
    * Scale: each tier's plan is its declared one (bucketed / list-probed /
    * code-scanned); the eval adds one left join of the union of
    * predictions (≤ 5·|Q| rows per method) against the truth pairs and a
    * 5-row aggregate. The denominator is a single-row broadcast (allowed
    * BNLJ class). Truth comes from the session-memoized [[bruteTruth]],
    * so the brute pass — the one intentionally expensive input —
    * executes exactly once per session, shared with the frontier. */
  def annEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val truth = bruteTruth(s, dir)
    val methods: Seq[(String, DataFrame)] = Seq(
      "ivf" -> knnIvf(s, dir), "ivf2" -> knnIvf2(s, dir),
      "ivfpq" -> knnIvfPq(s, dir), "lsh" -> knnLsh(s, dir),
      "pq" -> knnPq(s, dir), "sq8" -> knnSq8(s, dir))
    val preds = methods.map { case (nm, df) =>
      df.select(lit(nm).as("method"), $"q_id", $"vec_id")
    }.reduce(_.unionByName(_))
    val perMethod = preds
      .join(truth.withColumn("hit", lit(1L)), Seq("q_id", "vec_id"), "left")
      .groupBy($"method")
      .agg(count(lit(1)).as("n_pred"),
        sum(coalesce($"hit", lit(0L))).as("hits"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    perMethod.crossJoin(broadcast(nTruth))
      .select($"method", $"n_pred", $"hits",
        expr("(1000000 * hits) div n_truth").as("recall_ppm"))
      .orderBy($"method")
  }

  /** Pre-materialize an oracle fragment EMBEDDED inside another oracle's
    * subquery: [[graft.OracleSql.materializeShared]] (the Registry choke
    * point) only walks the assembled statement's TOP-LEVEL WITH clause,
    * so a fragment's internal shared CTEs — the unrolled Lloyd chains —
    * would stay un-materialized and DuckDB 1.x re-inlines them at every
    * reference. That re-expansion is combinatorial: the six-arm
    * [[annEvalSql]] measured 385 s (and ~70 GB of spill at the r20
    * pre-fix K) vs 12.5 s with the arms' chains materialized, identical
    * results. Applying the same rewriter to the fragment BEFORE embedding
    * restores exactly the standalone arm's evaluation shape. */
  private def matSql(sql: String): String =
    graft.OracleSql.materializeShared(sql)

  /** DuckDB mirror: each tier's full oracle SQL embedded as a scoped
    * subquery (inner CTEs shadow cleanly), joined pair-for-pair against
    * the brute truth. Assembled by concatenation — NOT stripMargin — so
    * the embedded, already-stripped tier SQLs cannot lose margin pipes. */
  val annEvalSql: String = {
    val ms = Seq("ivf" -> knnIvfSql, "ivf2" -> knnIvf2Sql,
      "ivfpq" -> knnIvfPqSql, "lsh" -> knnLshSql,
      "pq" -> knnPqSql, "sq8" -> knnSq8Sql)
    // AS MATERIALIZED (r20): each arm's prediction set is consumed twice
    // (count + truth join) and DuckDB's inlining heuristic can re-expand
    // the whole arm — including its unrolled Lloyd chain — into BOTH
    // scalar subqueries; with the r20 dynamic K the chains grew enough
    // (K=40 at sf1) that the re-expansion pushed this mirror past the
    // sweep budget. Forcing materialization evaluates every arm exactly
    // once; semantics unchanged.
    val ctes = ms.map { case (nm, q) =>
      s"p_$nm AS MATERIALIZED (SELECT q_id, vec_id FROM (\n${matSql(q)}\n) t_$nm)"
    }.mkString(",\n")
    val stats = ms.map { case (nm, _) =>
      s"SELECT '$nm' AS method,\n" +
        s"  (SELECT COUNT(*) FROM p_$nm) AS n_pred,\n" +
        s"  (SELECT COUNT(*) FROM p_$nm p JOIN truth t" +
        " ON p.q_id = t.q_id AND p.vec_id = t.vec_id) AS hits"
    }.mkString("\nUNION ALL\n")
    "WITH truth AS MATERIALIZED (SELECT q_id, vec_id FROM (\n" + matSql(knnBruteSql) +
      "\n) t_truth),\n" + ctes + ",\nstats AS (\n" + stats + ")\n" +
      "SELECT method, n_pred, hits,\n" +
      "  (1000000 * hits) // (SELECT COUNT(*) FROM truth) AS recall_ppm\n" +
      "FROM stats ORDER BY method"
  }

  // --- X3n: recall after deletion ------------------------------------------
  /** The delete-path audit row: what happens to IVF recall when vectors
    * are TOMBSTONED out of a published index vs retraining from scratch
    * on the survivors. The tombstone set is the deterministic predicate
    * `vec_id % 7 = 3` (≈14% of the corpus — a real retention pass);
    * truth is the brute top-5 over the SURVIVING corpus for surviving
    * queries (a deleted vector must never be served, and a deleted query
    * is no longer a query).
    *
    *  - `ivf_post_delete`: the index trained BEFORE the deletes (centroid
    *    pick + probe ranking over the full corpus, exactly [[knnIvf]]'s),
    *    served with tombstone-FILTERED inverted lists — the
    *    `ArtifactStore.loadSurviving` serving path, where a delete is
    *    visible immediately and no corpus-sized rewrite happened.
    *  - `ivf_retrained`: centroids re-picked and lists rebuilt from the
    *    survivors only — what a full [[graft.sources.ArtifactStore
    *    .compact]] + retrain cycle converges to.
    *
    * The two rows land side by side so the drift the delete path accrues
    * before its next retrain is a NUMBER in the oracle surface (ExtSpec
    * additionally pins: no tombstoned id in either leg's output, and the
    * filtered-serving leg equals a from-scratch reassignment of the
    * survivors under the SAME centroids — the compaction equivalence).
    *
    * Scale: both legs are the standard IVF plan (broadcast centroids,
    * equi-join on bucket); the tombstone filter is a pushed-down
    * predicate on the list scan, NOT an extra join, exactly how the
    * anti-join serving path behaves when the tombstone set broadcasts. */
  def annDeleteEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", q6Arr($"embedding").as("qe"))
      .select($"vec_id", $"qe", dotQ($"qe", $"qe").as("nrm"))
    val keep = ($"vec_id" % 7) =!= 3
    val surv = e.filter(keep)

    // one IVF leg: centroids picked from `centSrc`, probe ranking over
    // `rankCorpus`, lists + queries restricted by `keepCond`. K tracks
    // the leg's own training-corpus size (r20): the post-delete leg keeps
    // the K its full-corpus training chose; the retrained leg re-derives
    // it from the survivors — exactly what retraining does in production.
    def leg(centSrc: DataFrame, rankCorpus: DataFrame,
        keepCond: org.apache.spark.sql.Column): DataFrame = {
      val cents = centSrc
        .orderBy(md5(concat(lit("ivf_"), $"vec_id".cast(StringType))).asc,
          $"vec_id".asc)
        .limit(ivfK(centSrc.count()))
        .toDF("c_id", "c_qe", "c_nrm")
      val scoredCents = rankCorpus.join(broadcast(cents), lit(true))
        .select($"vec_id", $"qe", $"nrm", $"c_id",
          cosine(dotQ($"qe", $"c_qe"), $"nrm", $"c_nrm").as("c_cos"))
      val wAssign = Window.partitionBy($"vec_id")
        .orderBy($"c_cos".desc, $"c_id".asc)
      val ranked = scoredCents.withColumn("crn", row_number().over(wAssign))
      val assign = ranked.filter($"crn" === 1 && keepCond)
        .select($"vec_id", $"c_id".as("bucket"))
      val probes = ranked.filter($"vec_id" < 20 && keepCond && $"crn" <= NPROBE)
        .select($"vec_id".as("q_id"), $"qe".as("q_emb"), $"nrm".as("q_nrm"),
          $"c_id".as("bucket"))
      val scored = probes.join(assign, Seq("bucket"))
        .filter($"vec_id" =!= $"q_id")
        .join(e, Seq("vec_id"))
        .select($"q_id", $"vec_id",
          cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
        .distinct()
      val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .select($"q_id", $"vec_id")
    }
    val postDelete = leg(e, e, keep)
    val retrained = leg(surv, surv, lit(true))

    val q = surv.filter($"vec_id" < 20).toDF("q_id", "q_emb", "q_nrm")
    val truthScored = surv.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
    val wT = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    val truth = truthScored.withColumn("rnk", row_number().over(wT))
      .filter($"rnk" <= 5)
      .select($"q_id", $"vec_id")

    val preds = Seq("ivf_post_delete" -> postDelete,
      "ivf_retrained" -> retrained).map { case (nm, df) =>
      df.select(lit(nm).as("method"), $"q_id", $"vec_id")
    }.reduce(_.unionByName(_))
    val perMethod = preds
      .join(truth.withColumn("hit", lit(1L)), Seq("q_id", "vec_id"), "left")
      .groupBy($"method")
      .agg(count(lit(1)).as("n_pred"),
        sum(coalesce($"hit", lit(0L))).as("hits"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    perMethod.crossJoin(broadcast(nTruth))
      .select($"method", $"n_pred", $"hits",
        expr("(1000000 * hits) div n_truth").as("recall_ppm"))
      .orderBy($"method")
  }

  /** DuckDB mirror of [[annDeleteEval]]: [[knnIvfSql]]'s CTE chain twice
    * (full-corpus index with filtered lists; survivor-trained index),
    * plus the survivor brute truth, folded into the [[annEvalSql]] stats
    * shape. */
  val annDeleteEvalSql: String = {
    def legSql(tag: String, centWhere: String, rankWhere: String,
        listWhere: String): String =
      s"""cent_$tag AS (
         |  SELECT vec_id FROM embeddings $centWhere
         |  ORDER BY md5('ivf_' || CAST(vec_id AS VARCHAR)), vec_id
         |  LIMIT (SELECT ${ivfKSql("COUNT(*)")} FROM embeddings $centWhere)),
         |cs_$tag AS (
         |  SELECT v.vec_id, c.vec_id AS c_id,
         |    CAST(${dotSql("v.embedding", "c.embedding")} AS DOUBLE)
         |      / (sqrt(CAST(vn.nrm AS DOUBLE)) * sqrt(CAST(cn.nrm AS DOUBLE))) AS c_cos
         |  FROM embeddings v
         |  JOIN norms vn ON v.vec_id = vn.vec_id
         |  JOIN embeddings c ON c.vec_id IN (SELECT vec_id FROM cent_$tag)
         |  JOIN norms cn ON c.vec_id = cn.vec_id, $idxSql
         |  $rankWhere
         |  GROUP BY v.vec_id, c.vec_id, vn.nrm, cn.nrm),
         |rk_$tag AS (
         |  SELECT vec_id, c_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id ASC) AS crn
         |  FROM cs_$tag),
         |assign_$tag AS (SELECT vec_id, c_id AS bucket FROM rk_$tag
         |  WHERE crn = 1 $listWhere),
         |probes_$tag AS (SELECT vec_id AS q_id, c_id AS bucket FROM rk_$tag
         |  WHERE vec_id < 20 AND crn <= $NPROBE $listWhere),
         |cands_$tag AS (
         |  SELECT DISTINCT p.q_id, a.vec_id
         |  FROM probes_$tag p JOIN assign_$tag a ON p.bucket = a.bucket
         |  WHERE a.vec_id <> p.q_id),
         |scored_$tag AS (
         |  SELECT ca.q_id, ca.vec_id,
         |    CAST(${dotSql("q.embedding", "v.embedding")} AS DOUBLE)
         |      / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
         |  FROM cands_$tag ca
         |  JOIN embeddings q ON ca.q_id = q.vec_id
         |  JOIN embeddings v ON ca.vec_id = v.vec_id
         |  JOIN norms qn ON ca.q_id = qn.vec_id
         |  JOIN norms vn ON ca.vec_id = vn.vec_id, $idxSql
         |  GROUP BY ca.q_id, ca.vec_id, qn.nrm, vn.nrm),
         |p_$tag AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
         |    FROM scored_$tag) WHERE rnk <= 5)""".stripMargin
    val pd = legSql("pd", "", "", "AND vec_id % 7 <> 3")
    val rt = legSql("rt", "WHERE vec_id % 7 <> 3",
      "WHERE v.vec_id % 7 <> 3", "")
    val stats = Seq("ivf_post_delete" -> "p_pd", "ivf_retrained" -> "p_rt")
      .map { case (nm, cte) =>
        s"SELECT '$nm' AS method,\n" +
          s"  (SELECT COUNT(*) FROM $cte) AS n_pred,\n" +
          s"  (SELECT COUNT(*) FROM $cte p JOIN truth t" +
          " ON p.q_id = t.q_id AND p.vec_id = t.vec_id) AS hits"
      }.mkString("\nUNION ALL\n")
    s"""WITH $normsCte,
       |$pd,
       |$rt,
       |dots_t AS (
       |  SELECT q.vec_id AS q_id, v.vec_id AS vec_id,
       |    ${dotSql("q.embedding", "v.embedding")} AS dot
       |  FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id, $idxSql
       |  WHERE q.vec_id < 20 AND q.vec_id % 7 <> 3 AND v.vec_id % 7 <> 3
       |  GROUP BY 1, 2),
       |scored_t AS (
       |  SELECT q_id, dots_t.vec_id AS vec_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
       |  FROM dots_t
       |  JOIN norms qn ON q_id = qn.vec_id
       |  JOIN norms vn ON dots_t.vec_id = vn.vec_id),
       |truth AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |    FROM scored_t) WHERE rnk <= 5),
       |stats AS (
       |$stats)
       |SELECT method, n_pred, hits,
       |  (1000000 * hits) // (SELECT COUNT(*) FROM truth) AS recall_ppm
       |FROM stats ORDER BY method""".stripMargin
  }

  // --- X3j: nprobe recall/cost frontier -----------------------------------
  /** The recall/cost frontier of the learned-IVF index AS DATA: one audit
    * row per probe depth (nprobe ∈ 1,2,4,8) with candidate volume and
    * integer-ppm recall@5 vs the shared brute truth — what `q_dedup_eval`
    * does for banding config, applied to the knob every IVF deployment
    * tunes. Because every tier re-ranks with EXACT cosine, a query's
    * candidate sets are nested across depths, so hits = |candidates ∩
    * truth| and recall is provably monotone in nprobe (asserted in
    * ExtSpec); n_pred is the cost axis.
    *
    * Scale: the assignment/probe ranking is computed once (one O(n·K)
    * broadcast pass); candidates are scored once, tagged with the probe
    * rank of their bucket, and each depth is a filter + per-depth top-5
    * window over candidate rows only — the frontier costs one candidate
    * scan, not one index run per config. */
  def annFrontier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val maxProbe = 8
    val e = quantized(s, dir)
    val ranked = rankedAssign(s, dir)
    val assign = ranked.filter($"crn" === 1)
      .select($"vec_id", $"c_id".as("bucket"))
    val probes = ranked.filter($"vec_id" < 20 && $"crn" <= maxProbe)
      .select($"vec_id", $"c_id".as("bucket"), $"crn".as("probe_rank"))
      .join(e, Seq("vec_id"))
      .select($"vec_id".as("q_id"), $"qe".as("q_emb"), $"nrm".as("q_nrm"),
        $"bucket", $"probe_rank")
    // each vector lives in exactly one list, so (q_id, vec_id) is unique
    // and carries the probe depth at which it first becomes visible
    val cand = probes.join(assign, Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .join(e, Seq("vec_id"))
      .select($"q_id", $"vec_id", $"probe_rank",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
    val truth = bruteTruth(s, dir)
    val byLevel = cand
      .select($"q_id", $"vec_id", $"probe_rank", $"cos_sim",
        explode(typedLit(Seq(1, 2, 4, 8))).as("nprobe"))
      .filter($"probe_rank" <= $"nprobe")
    val w = Window.partitionBy($"nprobe", $"q_id")
      .orderBy($"cos_sim".desc, $"vec_id".asc)
    val top = byLevel.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    top.join(truth.withColumn("hit", lit(1L)), Seq("q_id", "vec_id"), "left")
      .groupBy($"nprobe")
      .agg(count(lit(1)).as("n_pred"),
        sum(coalesce($"hit", lit(0L))).as("hits"))
      .crossJoin(broadcast(nTruth))
      .select($"nprobe".cast(LongType).as("nprobe"), $"n_pred", $"hits",
        expr("(1000000 * hits) div n_truth").as("recall_ppm"))
      .orderBy($"nprobe")
  }

  /** DuckDB mirror: the shared unrolled k-means CTEs provide the trained
    * assignment ranking; candidates join through it, score once, and each
    * depth is a filter over the probe rank — then the brute truth embeds
    * as a scoped subquery exactly as in [[annEvalSql]]. */
  val annFrontierSql: String =
    s"""WITH $kmeansCtesSql,
       |assign AS (SELECT vec_id, c_id FROM aranked3 WHERE crn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, c_id, crn AS probe_rank
       |  FROM aranked3 WHERE vec_id < 20 AND crn <= 8),
       |cand AS (
       |  SELECT p.q_id, a.vec_id, p.probe_rank
       |  FROM probes p
       |  JOIN assign a ON p.c_id = a.c_id AND a.vec_id <> p.q_id),
       |cdots AS (
       |  SELECT c.q_id, c.vec_id, c.probe_rank, SUM(v1.qv * v2.qv) AS dot
       |  FROM cand c
       |  JOIN vq v1 ON v1.vec_id = c.q_id
       |  JOIN vq v2 ON v2.vec_id = c.vec_id AND v1.g = v2.g
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT cd.q_id, cd.vec_id, cd.probe_rank,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn.nrm AS DOUBLE)) *
       |      sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
       |  FROM cdots cd
       |  JOIN norms qn ON cd.q_id = qn.vec_id
       |  JOIN norms vn ON cd.vec_id = vn.vec_id),
       |byl AS (
       |  SELECT l.nprobe, sc.q_id, sc.vec_id,
       |    row_number() OVER (PARTITION BY l.nprobe, sc.q_id
       |      ORDER BY sc.cos_sim DESC, sc.vec_id ASC) AS rnk
       |  FROM scored sc
       |  JOIN (SELECT unnest([1, 2, 4, 8]) AS nprobe) l
       |    ON sc.probe_rank <= l.nprobe),
       |topk AS (SELECT nprobe, q_id, vec_id FROM byl WHERE rnk <= 5),
       |truth AS (SELECT q_id, vec_id FROM (
       |${matSql(knnBruteSql)}
       |) t_truth),
       |stats AS (
       |  SELECT p.nprobe, COUNT(*) AS n_pred,
       |    CAST(SUM(CASE WHEN t.q_id IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS hits
       |  FROM topk p
       |  LEFT JOIN truth t ON p.q_id = t.q_id AND p.vec_id = t.vec_id
       |  GROUP BY 1)
       |SELECT CAST(nprobe AS BIGINT) AS nprobe, n_pred, hits,
       |  (1000000 * hits) // (SELECT COUNT(*) FROM truth) AS recall_ppm
       |FROM stats ORDER BY nprobe""".stripMargin

  // --- X3q: ADC rerank-depth frontier -------------------------------------

  /** Rerank depths swept by [[annRerankFrontier]]. */
  private val RERANK_DEPTHS = Seq(5, 10, 20, 40)

  /** X3q — the RERANK-DEPTH frontier, the other tuning axis of a
    * PQ-backed index besides nprobe ([[annFrontier]]): how many
    * ADC-ranked candidates must the exact re-rank read back to recover
    * the true top-5? ADC compresses 64 dims to 8 nibble lookups, so its
    * ranking is approximate — the re-rank repairs it, and depth C is the
    * exact-read budget per query (the dominant serving cost: C full
    * vectors fetched per query at 100 TB). The sweep scores the exact
    * cosine ONCE for the deepest C and derives every shallower depth by
    * filtering the carried ADC rank — one candidate join, not one per
    * depth; recall vs the session-memoized brute truth in integer ppm.
    * Read together with [[annFrontier]] this answers the actual
    * deployment question: spend the next millisecond on more probes or
    * on a deeper re-rank. */
  def annRerankFrontier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = quantized(s, dir)
    val adc = pqCodesMemo(s, dir)
      .join(pqLut(e, pqCodebookMemo(s, dir)), Seq("m", "cid"))
      .where($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id").agg(sum($"part").as("adc_dot"))
    val maxDepth = RERANK_DEPTHS.max
    val ranked = adc.join(e.select($"vec_id", $"nrm"), Seq("vec_id"))
      .withColumn("adc_rn", row_number().over(Window.partitionBy($"q_id")
        .orderBy(($"adc_dot".cast(DoubleType) / sqrt($"nrm".cast(DoubleType)))
          .desc, $"vec_id".asc)))
      .where($"adc_rn" <= maxDepth)
      .select($"q_id", $"vec_id", $"adc_rn")
    val q = e.where($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"qe".as("q_emb"), $"nrm".as("q_nrm"))
    val scored = ranked.join(broadcast(q), Seq("q_id")).join(e, Seq("vec_id"))
      .select($"q_id", $"vec_id", $"adc_rn",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
    val byDepth = scored
      .select($"q_id", $"vec_id", $"adc_rn", $"cos_sim",
        explode(typedLit(RERANK_DEPTHS)).as("depth"))
      .filter($"adc_rn" <= $"depth")
    val w = Window.partitionBy($"depth", $"q_id")
      .orderBy($"cos_sim".desc, $"vec_id".asc)
    val top = byDepth.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
    val truth = bruteTruth(s, dir)
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    top.join(truth.withColumn("hit", lit(1L)), Seq("q_id", "vec_id"), "left")
      .groupBy($"depth")
      .agg(count(lit(1)).as("n_pred"),
        sum(coalesce($"hit", lit(0L))).as("hits"))
      .crossJoin(broadcast(nTruth))
      .select($"depth".cast(LongType).as("rerank_depth"), $"n_pred",
        $"hits", expr("(1000000 * hits) div n_truth").as("recall_ppm"))
      .orderBy($"rerank_depth")
  }

  val annRerankFrontierSql: String =
    s"""WITH $normsCte,
       |${pqTrainCtesSql(qvIdentitySql)},
       |adc AS (
       |  SELECT l.q_id, cd.vec_id, CAST(SUM(l.part) AS BIGINT) AS adc_dot
       |  FROM codes$PQ_ROUNDS cd JOIN lut l ON cd.m = l.m AND cd.cid = l.cid
       |  WHERE cd.vec_id <> l.q_id GROUP BY 1, 2),
       |ranked AS (
       |  SELECT a.q_id, a.vec_id, ROW_NUMBER() OVER (PARTITION BY a.q_id
       |    ORDER BY CAST(a.adc_dot AS DOUBLE) / sqrt(CAST(n.nrm AS DOUBLE))
       |      DESC, a.vec_id ASC) AS adc_rn
       |  FROM adc a JOIN norms n ON a.vec_id = n.vec_id),
       |cand AS (SELECT q_id, vec_id, adc_rn FROM ranked
       |  WHERE adc_rn <= ${RERANK_DEPTHS.max}),
       |ex AS (
       |  SELECT cd.q_id, cd.vec_id, cd.adc_rn,
       |    ${dotSql("q.embedding", "v.embedding")} AS dot
       |  FROM cand cd
       |  JOIN embeddings q ON cd.q_id = q.vec_id
       |  JOIN embeddings v ON cd.vec_id = v.vec_id, $idxSql
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT ex.q_id, ex.vec_id, ex.adc_rn,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn.nrm AS DOUBLE)) *
       |      sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
       |  FROM ex
       |  JOIN norms qn ON ex.q_id = qn.vec_id
       |  JOIN norms vn ON ex.vec_id = vn.vec_id),
       |byd AS (
       |  SELECT d.depth, sc.q_id, sc.vec_id,
       |    row_number() OVER (PARTITION BY d.depth, sc.q_id
       |      ORDER BY sc.cos_sim DESC, sc.vec_id ASC) AS rnk
       |  FROM scored sc
       |  JOIN (SELECT unnest([${RERANK_DEPTHS.mkString(", ")}]) AS depth) d
       |    ON sc.adc_rn <= d.depth),
       |topk AS (SELECT depth, q_id, vec_id FROM byd WHERE rnk <= 5),
       |truth AS (SELECT q_id, vec_id FROM (
       |${matSql(knnBruteSql)}
       |) t_truth),
       |stats AS (
       |  SELECT p.depth, COUNT(*) AS n_pred,
       |    CAST(SUM(CASE WHEN t.q_id IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS hits
       |  FROM topk p
       |  LEFT JOIN truth t ON p.q_id = t.q_id AND p.vec_id = t.vec_id
       |  GROUP BY 1)
       |SELECT CAST(depth AS BIGINT) AS rerank_depth, n_pred, hits,
       |  (1000000 * hits) // (SELECT COUNT(*) FROM truth) AS recall_ppm
       |FROM stats ORDER BY rerank_depth""".stripMargin

  // --- X3k: OPQ permutation-family search for PQ ---------------------------

  /** The two structured candidate permutations, derived from per-dimension
    * variance: rank every dimension by the exact integer variance
    * surrogate n·Σx² − (Σx)² (ties on dim index), then lay ranks out
    *  - interleaved: rank r → subspace r mod M, slot r div M (each
    *    subspace gets one dim from every variance octile), and
    *  - snaked: boustrophedon over rank rows, balancing the SUM of
    *    variance per subspace rather than the spread.
    * Emitted as two 64-slot permutation arrays in ONE 1-row relation
    * (position t holds the source dim index). At 100 TB the moments come
    * from one narrow corpus pass (or the q_embed_dimstats sample — the
    * integer surrogate overflows int64 beyond ~10⁵ rows at this
    * quantization, so production ranks from the sampled fit). */
  private def dimPerms(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val ranked = e.select(posexplode($"qe").as(Seq("j", "x")))
      .groupBy($"j")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"))
      .select($"j", ($"n" * $"sxx" - $"sx" * $"sx").as("v"))
      .withColumn("r",
        row_number().over(Window.orderBy($"v".desc, $"j".asc)) - lit(1))
    val pos = ranked.select($"j", $"r",
      expr(s"(r % $PQ_M) * $PQ_SUB + r div $PQ_M").as("p_inter"),
      expr(s"(CASE WHEN (r div $PQ_M) % 2 = 0 THEN r % $PQ_M " +
        s"ELSE ${PQ_M - 1} - (r % $PQ_M) END) * $PQ_SUB + r div $PQ_M")
        .as("p_snake"))
    pos.agg(
      transform(array_sort(collect_list(struct($"p_inter".as("p"), $"j"))),
        c => c.getField("j")).as("pm_inter"),
      transform(array_sort(collect_list(struct($"p_snake".as("p"), $"j"))),
        c => c.getField("j")).as("pm_snake"),
      // dims in plain variance-rank order — the pairing table the learned
      // rotation consumes (rank p marries rank DIM-1-p)
      transform(array_sort(collect_list(struct($"r".as("p"), $"j"))),
        c => c.getField("j")).as("pm_rank"))
  }

  /** Apply a permutation array to the qe layout. The permutation is
    * orthogonal, so dot products and norms are untouched — `nrm` is
    * carried through, and the exact re-rank stays bit-identical. */
  private def permApply(e: DataFrame, pms: DataFrame, pmCol: String): DataFrame = {
    import e.sparkSession.implicits._
    e.crossJoin(broadcast(pms.select(col(pmCol).as("pm"))))
      .select($"vec_id",
        expr(s"transform(sequence(0, ${DIM - 1}), " +
          "t -> element_at(qe, element_at(pm, t + 1) + 1))").as("qe"),
        $"nrm")
  }

  /** The learned-ROTATION arm: one integer-exact Givens sweep. Pair the
    * rank-p-variance dimension with the rank-(DIM−1−p) dimension (the
    * learned part — hi-lo pairing equalizes per-pair energy, the
    * published OPQ objective) and rotate every pair by 45°, kept integer
    * by dropping the 1/√2: output slot 2p = hi + lo, slot 2p+1 =
    * hi − lo. The transform is √2 × an orthogonal matrix, so EVERY dot
    * product and squared norm scales by exactly 2 — (a+b)² + (a−b)² =
    * 2(a²+b²) — rankings are preserved exactly, integer arithmetic
    * stays exact (values ≤ 2× the quantized magnitude), and nrm carries
    * as 2·nrm with no recompute. Consecutive output pairs land in the
    * same subspace, so each subspace holds 4 near-equal-energy pairs —
    * variance balanced by construction, not by permutation shuffling. */
  private def rotApply(e: DataFrame, pms: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val hi = "element_at(qe, element_at(pm, CAST((t div 2) + 1 AS INT)) + 1)"
    val lo = s"element_at(qe, element_at(pm, CAST($DIM - (t div 2) AS INT)) + 1)"
    e.crossJoin(broadcast(pms.select(col("pm_rank").as("pm"))))
      .select($"vec_id",
        expr(s"transform(sequence(0, ${DIM - 1}), t -> " +
          s"CASE WHEN t % 2 = 0 THEN $hi + $lo ELSE $hi - $lo END)").as("qe"),
        ($"nrm" * 2).as("nrm"))
  }

  /** OPQ as it survives contact with a declarative engine: instead of
    * gradient OPQ, search a STRUCTURED family of orthogonal transforms —
    * identity, variance-interleave, variance-snake, and one LEARNED
    * Givens-sweep rotation ([[rotApply]]: 45° butterflies on the hi-lo
    * variance pairing, integer-exact via the uniform √2 scale) — by
    * running the full PQ pipeline under each and reading recall@5
    * against the shared memoized brute truth; `chosen` marks the argmax,
    * ties broken toward identity (the free layout). On isotropic data
    * the search degenerates to identity — which IS the honest OPQ answer
    * there, and this audit row is what shows it; on anisotropic or
    * correlated corpora the rotated/permuted arms win and get picked by
    * the same row.
    *
    * Scale: the family is a constant (4), each arm is the declared PQ
    * plan, truth is the session-memoized [[bruteTruth]], and the
    * permutation derivation is one narrow moments pass + a 64-row rank —
    * model selection on a validation slice, the way a real deployment
    * tunes its index. */
  def annOpq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = quantized(s, dir)
    val pms = dimPerms(e)
    def arm(tag: String, pmCol: String): DataFrame = {
      val pe = permApply(e, pms, pmCol)
      val cb = pqCbMemo(s, dir, tag, pe)
      knnPqOn(pe, cb, pqCodesTagMemo(s, dir, tag, pe, cb))
    }
    val rotated = rotApply(e, pms)
    val cbRot = pqCbMemo(s, dir, "_rot", rotated)
    val variants: Seq[(String, DataFrame)] = Seq(
      "pq_identity" -> knnPq(s, dir),
      "opq_interleave" -> arm("_inter", "pm_inter"),
      "opq_snake" -> arm("_snake", "pm_snake"),
      // the learned rotation: trains/encodes on the rotated layout,
      // ranks + re-ranks on the original (see knnPqOn)
      "opq_rotate" -> knnPqOn(rotated, cbRot,
        pqCodesTagMemo(s, dir, "_rot", rotated, cbRot), rerankE = e))
    val truth = bruteTruth(s, dir)
    val preds = variants.map { case (nm, df) =>
      df.select(lit(nm).as("variant"), $"q_id", $"vec_id")
    }.reduce(_.unionByName(_))
    val per = preds
      .join(truth.withColumn("hit", lit(1L)), Seq("q_id", "vec_id"), "left")
      .groupBy($"variant")
      .agg(count(lit(1)).as("n_pred"),
        sum(coalesce($"hit", lit(0L))).as("hits"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val scoredV = per.crossJoin(broadcast(nTruth))
      .select($"variant", $"n_pred", $"hits",
        expr("(1000000 * hits) div n_truth").as("recall_ppm"))
    val w = Window.orderBy($"recall_ppm".desc,
      ($"variant" === "pq_identity").desc, $"variant".asc)
    scoredV.withColumn("chosen", row_number().over(w) === 1)
      .orderBy($"variant")
  }

  /** DuckDB mirror: each arm embeds the full PQ pipeline SQL over its own
    * qv layout — identity, or the variance-rank permutation chain — then
    * the truth join and argmax selection mirror [[annEvalSql]]'s shape.
    * Assembled by concatenation (NOT stripMargin) like the eval. */
  val annOpqSql: String = {
    val qv0 = qvIdentitySql.replaceFirst("qv AS", "qv0 AS")
    val rankCtes =
      s"$qv0,\n" +
        s"dimv AS (\n" +
        s"  SELECT j.j AS j,\n" +
        s"    CAST(CAST(COUNT(*) AS BIGINT) * SUM(v.qe[j.j + 1] * v.qe[j.j + 1])\n" +
        s"      - SUM(v.qe[j.j + 1]) * SUM(v.qe[j.j + 1]) AS BIGINT) AS v\n" +
        s"  FROM qv0 v, (SELECT unnest(range(0, $DIM)) AS j) j GROUP BY 1),\n" +
        s"rankd AS (\n" +
        s"  SELECT j, ROW_NUMBER() OVER (ORDER BY v DESC, j ASC) - 1 AS r FROM dimv)"
    def permChain(posExpr: String): String =
      s"$rankCtes,\n" +
        s"permtab AS (SELECT j, $posExpr AS p FROM rankd),\n" +
        s"pmt AS (SELECT list(j ORDER BY p) AS pm FROM permtab),\n" +
        s"qv AS (\n" +
        s"  SELECT v.vec_id, list_transform(range(0, $DIM),\n" +
        s"    t -> v.qe[p.pm[t + 1] + 1]) AS qe\n" +
        s"  FROM qv0 v, pmt p)"
    // the learned rotation: hi-lo variance pairing + 45° butterfly,
    // kept integer by the uniform √2 scale (see rotApply)
    val rotChain =
      s"$rankCtes,\n" +
        s"pmt AS (SELECT list(j ORDER BY r) AS pm FROM rankd),\n" +
        s"qv AS (\n" +
        s"  SELECT v.vec_id, list_transform(range(0, $DIM),\n" +
        s"    t -> CASE WHEN t % 2 = 0\n" +
        s"      THEN v.qe[p.pm[t // 2 + 1] + 1] + v.qe[p.pm[$DIM - t // 2] + 1]\n" +
        s"      ELSE v.qe[p.pm[t // 2 + 1] + 1] - v.qe[p.pm[$DIM - t // 2] + 1]\n" +
        s"      END) AS qe\n" +
        s"  FROM qv0 v, pmt p)"
    val variants = Seq(
      "pq_identity" -> qvIdentitySql,
      "opq_interleave" -> permChain(s"(r % $PQ_M) * $PQ_SUB + r // $PQ_M"),
      "opq_snake" -> permChain(
        s"(CASE WHEN (r // $PQ_M) % 2 = 0 THEN r % $PQ_M " +
          s"ELSE ${PQ_M - 1} - (r % $PQ_M) END) * $PQ_SUB + r // $PQ_M"),
      "opq_rotate" -> rotChain)
    val ctes = variants.map { case (nm, qvBlock) =>
      s"p_$nm AS (SELECT q_id, vec_id FROM (\n${pqPipelineSql(qvBlock)}\n) t_$nm)"
    }.mkString(",\n")
    val stats = variants.map { case (nm, _) =>
      s"SELECT '$nm' AS variant,\n" +
        s"  (SELECT COUNT(*) FROM p_$nm) AS n_pred,\n" +
        s"  (SELECT COUNT(*) FROM p_$nm p JOIN truth t" +
        " ON p.q_id = t.q_id AND p.vec_id = t.vec_id) AS hits"
    }.mkString("\nUNION ALL\n")
    "WITH truth AS (SELECT q_id, vec_id FROM (\n" + matSql(knnBruteSql) +
      "\n) t_truth),\n" + ctes + ",\nstats AS (\n" + stats + "),\n" +
      "recs AS (SELECT variant, n_pred, hits,\n" +
      "  (1000000 * hits) // (SELECT COUNT(*) FROM truth) AS recall_ppm\n" +
      "FROM stats)\n" +
      "SELECT variant, n_pred, hits, recall_ppm,\n" +
      "  ROW_NUMBER() OVER (ORDER BY recall_ppm DESC,\n" +
      "    (variant = 'pq_identity') DESC, variant ASC) = 1 AS chosen\n" +
      "FROM recs ORDER BY variant"
  }

  // --- X3o: RANGE (radius) search + IVF recall audit ----------------------

  /** Cosine radius for [[annRange]] — ~4–5 true matches per query on this
    * isotropic corpus at sf0.01 (match counts scale with the corpus; the
    * audit is count-based so any SF works). */
  private val RANGE_TAU = 0.3

  /** RANGE SEARCH — "every vector within cosine ≥ τ", the other
    * first-class vector-store API besides top-k (Faiss `range_search`;
    * dedup-by-radius and recall-oriented retrieval both need the full
    * thresholded SET, which a fixed-k top-k cannot deliver: k too small
    * under-returns dense neighborhoods, k too large wastes scan). The
    * brute arm streams the corpus once against the broadcast query batch
    * and thresholds exactly; the IVF arm probes the same memoized
    * trained index as the top-k tiers ([[rankedAssign]], [[NPROBE2]]
    * lists) and thresholds the probed candidates. Output is the
    * per-query audit — true count, probed-found count, integer recall —
    * making the probe-miss structure (a true match whose list was not
    * probed) visible as data, exactly the X3i eval discipline applied to
    * radius semantics.
    *
    * Scale: brute truth is one corpus pass per (small) query batch — the
    * honest baseline; the IVF arm's per-query scan is |corpus|/K·nprobe
    * rows. Both threshold on the SAME exact integer-quantized cosine, so
    * found ⊆ true by construction and recall is exact. */
  def annRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = quantized(s, dir)
    val qs = e.filter($"vec_id" < 20)
      .toDF("q_id", "q_emb", "q_nrm")
    val truth = e.join(broadcast(qs), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
      .filter($"cos_sim" >= RANGE_TAU)
      .groupBy($"q_id").agg(count(lit(1)).as("n_true"))
    val ranked = rankedAssign(s, dir)
    val assign = ranked.filter($"crn" === 1)
      .select($"vec_id", $"c_id".as("bucket"))
    val probes = ranked.filter($"vec_id" < 20 && $"crn" <= NPROBE2)
      .select($"vec_id", $"c_id".as("bucket"))
      .join(e, Seq("vec_id"))
      .select($"vec_id".as("q_id"), $"qe".as("q_emb"), $"nrm".as("q_nrm"),
        $"bucket")
    val found = probes.join(assign, Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .join(e, Seq("vec_id"))
      .select($"q_id", $"vec_id",
        cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
      .distinct()
      .filter($"cos_sim" >= RANGE_TAU)
      .groupBy($"q_id").agg(count(lit(1)).as("n_found"))
    qs.select($"q_id")
      .join(truth, Seq("q_id"), "left")
      .join(found, Seq("q_id"), "left")
      .select($"q_id",
        coalesce($"n_true", lit(0L)).as("n_true"),
        coalesce($"n_found", lit(0L)).as("n_found"))
      .withColumn("recall_pct",
        expr("(100 * n_found) div greatest(n_true, 1)"))
      .orderBy($"q_id")
  }

  val annRangeSql: String =
    s"""WITH $kmeansCtesSql,
       |tdots AS (
       |  SELECT q.vec_id AS q_id, v.vec_id AS vec_id, SUM(q.qv * v.qv) AS dot
       |  FROM vq q JOIN vq v ON q.g = v.g AND q.vec_id <> v.vec_id
       |  WHERE q.vec_id < 20
       |  GROUP BY 1, 2),
       |truthv AS (
       |  SELECT d.q_id, d.vec_id,
       |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(qn.nrm AS DOUBLE)) *
       |      sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
       |  FROM tdots d
       |  JOIN norms qn ON d.q_id = qn.vec_id
       |  JOIN norms vn ON d.vec_id = vn.vec_id),
       |truth AS (
       |  SELECT q_id, COUNT(*) AS n_true FROM truthv
       |  WHERE cos_sim >= $RANGE_TAU GROUP BY 1),
       |assign AS (SELECT vec_id, c_id AS bucket FROM aranked3 WHERE crn = 1),
       |probes AS (SELECT vec_id AS q_id, c_id AS bucket FROM aranked3
       |  WHERE vec_id < 20 AND crn <= $NPROBE2),
       |cands AS (
       |  SELECT DISTINCT p.q_id, a.vec_id
       |  FROM probes p JOIN assign a ON p.bucket = a.bucket
       |  WHERE a.vec_id <> p.q_id),
       |found AS (
       |  SELECT t.q_id, COUNT(*) AS n_found
       |  FROM truthv t JOIN cands c ON t.q_id = c.q_id AND t.vec_id = c.vec_id
       |  WHERE t.cos_sim >= $RANGE_TAU GROUP BY 1)
       |SELECT q.vec_id AS q_id,
       |  CAST(COALESCE(t.n_true, 0) AS BIGINT) AS n_true,
       |  CAST(COALESCE(f.n_found, 0) AS BIGINT) AS n_found,
       |  CAST((100 * COALESCE(f.n_found, 0))
       |    // GREATEST(COALESCE(t.n_true, 0), 1) AS BIGINT) AS recall_pct
       |FROM embeddings q
       |LEFT JOIN truth t ON q.vec_id = t.q_id
       |LEFT JOIN found f ON q.vec_id = f.q_id
       |WHERE q.vec_id < 20
       |ORDER BY q_id""".stripMargin

  // --- X3t: centroid drift between index versions -----------------------

  /** A cohort coarse quantizer: the SAME training recipe on the
    * vec_id-parity half of the embeddings — the deterministic stand-in
    * for two index versions trained on successive corpus snapshots.
    * Memoized like [[trainedCents]]. */
  private def cohortCents(s: SparkSession, dir: String, par: Int): DataFrame =
    graft.GraftSession.memo(s, s"ivf_cents_p$par|" +
        graft.GraftSession.contentKey(dir, Seq("embeddings"))) {
      import s.implicits._
      graft.GraftSession.ckpt(learnedCents(quantizeRaw(
        Tables.embeddings(s, dir).filter($"vec_id" % 2 === par)
          .select($"vec_id", $"embedding"))))
    }

  /** X3t — centroid DRIFT between index versions, the
    * `q_tokenizer_drift` pattern applied to the vector index: train the
    * SAME coarse quantizer recipe on two embedding cohorts and audit
    * how the learned centroid sets align — for every version-A
    * centroid, its best-matching version-B centroid by quantized
    * cosine, and whether the match is MUTUAL (A is also B's best
    * match). High alignment with mostly-mutual matches means a
    * re-trained index preserves list geometry (per-list artifacts like
    * nprobe tunings and residual codebooks carry over); broken mutuals
    * localize which regions of the space moved. Same packed-integer
    * arg-max discipline as the cluster cards; the K_a×K_b pair table is
    * centroid-dictionary grain ((n/target)² ~ 10⁶ rows even at 10⁹
    * vectors; both trainings are the bounded Lloyd loop on memoized
    * cohort artifacts).
    * The oracle unrolls BOTH trainings via the suffix-parameterized
    * k-means chain. */
  def centroidDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = cohortCents(s, dir, 0).toDF("a_id", "a_qe", "a_nrm")
    val b = cohortCents(s, dir, 1).toDF("b_id", "b_qe", "b_nrm")
    val pairs = a.crossJoin(broadcast(b))
      .select($"a_id", $"b_id",
        floor(cosine(dotQ($"a_qe", $"b_qe"), $"a_nrm", $"b_nrm") * 1000000L)
          .as("cq"))
    val bestA = pairs.groupBy($"a_id").agg(
      max_by($"b_id", $"cq" * ID_STRIDE - $"b_id").as("b_id"),
      max($"cq").as("align_ppm"))
    val bestB = pairs.groupBy($"b_id").agg(
      max_by($"a_id", $"cq" * ID_STRIDE - $"a_id").as("a_of_b"))
    bestA.join(bestB, Seq("b_id"))
      .select($"a_id", $"b_id", $"align_ppm",
        when($"a_of_b" === $"a_id", 1L).otherwise(0L).as("mutual"))
      .orderBy($"a_id")
  }

  val centroidDriftSql: String =
    s"""WITH ${kmeansChainSql("ca", "vec_id % 2 = 0")},
       |${kmeansChainSql("cb", "vec_id % 2 = 1")},
       |pairs AS (
       |  SELECT a.c_id AS a_id, b.c_id AS b_id,
       |    CAST(floor(CAST(SUM(a.m * b.m) AS DOUBLE)
       |      / (sqrt(CAST(an.cnrm AS DOUBLE)) * sqrt(CAST(bn.cnrm AS DOUBLE)))
       |      * 1000000) AS BIGINT) AS cq
       |  FROM c2ca a JOIN c2cb b ON a.g = b.g
       |  JOIN c2ca_norm an ON a.c_id = an.c_id
       |  JOIN c2cb_norm bn ON b.c_id = bn.c_id
       |  GROUP BY a.c_id, b.c_id, an.cnrm, bn.cnrm),
       |besta AS (
       |  SELECT a_id, arg_max(b_id, cq * $ID_STRIDE - b_id) AS b_id,
       |    CAST(MAX(cq) AS BIGINT) AS align_ppm
       |  FROM pairs GROUP BY a_id),
       |bestb AS (
       |  SELECT b_id, arg_max(a_id, cq * $ID_STRIDE - a_id) AS a_of_b
       |  FROM pairs GROUP BY b_id)
       |SELECT a.a_id, a.b_id, a.align_ppm,
       |  CAST(CASE WHEN b.a_of_b = a.a_id THEN 1 ELSE 0 END AS BIGINT)
       |    AS mutual
       |FROM besta a JOIN bestb b ON a.b_id = b.b_id
       |ORDER BY a.a_id""".stripMargin

  // --- X3r: cluster cards — the census behind cluster-based curation ----

  /** Per-cluster CARDS over the trained coarse quantizer — the census a
    * cluster-based curation pass (SemDeDup / density-pruning family)
    * reads before deciding which clusters to downsample, dedupe
    * aggressively, or drop: for every k-means cluster, its size, label
    * spread, dominant label with purity, a deterministic MEDOID (the
    * member the curator actually eyeballs), and the cluster's cohesion
    * (mean member→centroid cosine in ppm).
    *
    * Determinism discipline: the medoid and the dominant label are
    * arg-max over PACKED INTEGER keys (`cq·10⁷ − vec_id`,
    * `cnt·10⁶ − label`), so the tie-break is part of the ordered value
    * itself — no engine-specific struct-compare or multi-column arg_max
    * semantics. Cohesion quantizes cosine per row (`floor(cos·10⁶)`)
    * BEFORE the integer sum — order-independent where a double mean is
    * not — and the sum is shifted by +10⁶ per row so the one division
    * sees non-negative operands (Spark `div` truncates, DuckDB `//`
    * floors; they agree only at ≥ 0).
    *
    * Scale shape: everything derives from the memoized
    * [[rankedAssign]] index (trained once, like a real deploy): the
    * label branch is one hash aggregate on (cluster, label) collapsing
    * to ≤ K·|labels| groups; the geometry branch re-attaches the K-row
    * centroid table by BROADCAST and folds per member — no corpus
    * self-join anywhere; the final card join runs over K rows. */
  /** (c_id, vec_id, cq) — every member with its quantized cosine to its
    * OWN centroid, the shared geometry input of `q_cluster_cards` and
    * `q_embed_outliers`: members from the memoized index, the K-row
    * centroid table re-attached by broadcast, `cq = floor(cos·10⁶)`. */
  private def memberCos(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    rankedAssign(s, dir).filter($"crn" === 1)
      .select($"vec_id", $"c_id")
      .join(quantized(s, dir), Seq("vec_id"))
      .join(broadcast(trainedCents(s, dir)), Seq("c_id"))
      .select($"c_id", $"vec_id",
        floor(cosine(dotQ($"qe", $"c_qe"), $"nrm", $"c_nrm") * 1000000L)
          .as("cq"))
  }

  // --- X3v: matryoshka (truncated-dimension) recall frontier -------------

  /** Dimension budgets audited by [[annMatryoshka]] (of [[DIM]] = 64). */
  private val MRL_DIMS = Seq(8, 16, 32)

  /** MATRYOSHKA recall frontier (round 13): recall@5 of brute-force
    * search over only the FIRST d dimensions, for d ∈ 8/16/32 of 64,
    * against the full-dimension truth — the audit behind
    * matryoshka-representation (MRL) serving, where a prefix of the
    * embedding is a cheaper index (d/64 of the scan FLOPs and memory
    * traffic) IF the model packed meaning front-first. The frontier row
    * per budget makes "how short can the prefix be" a measured number
    * instead of a guess — the same engineering question the rerank-depth
    * and nprobe frontiers answer for their knobs.
    *
    * Scale: each arm is the brute baseline's plan (broadcast 20-query
    * batch against the corpus scan) over a SLICED quantized array —
    * the candidate generation an MRL stack would run before re-ranking
    * the short-list at full dimension. */
  def annMatryoshka(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val truth = bruteTruth(s, dir)
    val e = quantized(s, dir)
    val arms = MRL_DIMS.map { d =>
      val ed = e.select($"vec_id", expr(s"slice(qe, 1, $d)").as("qd"))
        .select($"vec_id", $"qd", dotQ($"qd", $"qd").as("nrm_d"))
      val q = ed.filter($"vec_id" < 20).toDF("q_id", "q_qd", "q_nrm")
      val scored = ed.join(broadcast(q), $"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id",
          cosine(dotQ($"q_qd", $"qd"), $"q_nrm", $"nrm_d").as("cos_sim"))
      val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
      val preds = scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5).select($"q_id", $"vec_id")
      preds
        .join(truth.withColumn("hit", lit(1L)), Seq("q_id", "vec_id"), "left")
        .agg(count(lit(1)).as("n_pred"),
          coalesce(sum(coalesce($"hit", lit(0L))), lit(0L)).as("hits"))
        .select(lit(d.toLong).as("dim_budget"), $"n_pred", $"hits")
    }
    arms.reduce(_.unionByName(_))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
      .select($"dim_budget", $"n_pred", $"hits",
        expr("(1000000 * hits) div n_truth").as("recall_ppm"))
      .orderBy($"dim_budget")
  }

  /** DuckDB mirror: one brute arm per budget with its index range and
    * truncated norms, full-d truth embedded scoped. */
  lazy val annMatryoshkaSql: String = {
    def armSql(d: Int): String = {
      val idxD = s"(SELECT unnest(generate_series(1, $d)) AS g) i"
      s"""norms_$d AS (
         |  SELECT vec_id, ${dotSql("embedding", "embedding")} AS nrm
         |  FROM embeddings, $idxD GROUP BY vec_id),
         |dots_$d AS (
         |  SELECT q.vec_id AS q_id, v.vec_id AS vec_id,
         |    ${dotSql("q.embedding", "v.embedding")} AS dot
         |  FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id, $idxD
         |  WHERE q.vec_id < 20
         |  GROUP BY 1, 2),
         |preds_$d AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, dots_$d.vec_id AS vec_id, row_number() OVER (
         |      PARTITION BY q_id ORDER BY
         |        CAST(dot AS DOUBLE) / (sqrt(CAST(qn.nrm AS DOUBLE))
         |          * sqrt(CAST(vn.nrm AS DOUBLE))) DESC,
         |        dots_$d.vec_id ASC) AS rnk
         |    FROM dots_$d
         |    JOIN norms_$d qn ON q_id = qn.vec_id
         |    JOIN norms_$d vn ON dots_$d.vec_id = vn.vec_id)
         |  WHERE rnk <= 5),
         |row_$d AS (
         |  SELECT CAST($d AS BIGINT) AS dim_budget,
         |    CAST((SELECT COUNT(*) FROM preds_$d) AS BIGINT) AS n_pred,
         |    CAST((SELECT COUNT(*) FROM preds_$d p JOIN truth t
         |      ON p.q_id = t.q_id AND p.vec_id = t.vec_id) AS BIGINT)
         |      AS hits)""".stripMargin
    }
    "WITH truth AS (SELECT q_id, vec_id FROM (\n" + matSql(knnBruteSql) +
      "\n) tt),\n" + MRL_DIMS.map(armSql).mkString(",\n") + "\n" +
      "SELECT dim_budget, n_pred, hits,\n" +
      "  CAST((1000000 * hits) // (SELECT COUNT(*) FROM truth) AS BIGINT)" +
      " AS recall_ppm\nFROM (" +
      MRL_DIMS.map(d => s"SELECT * FROM row_$d").mkString(" UNION ALL ") +
      ")\nORDER BY dim_budget"
  }

  // --- X3u: cluster-pruned index recall — the SemDeDup loop closed -------

  /** Clusters dropped by the pruning pass (of the [[ivfK]](n) trained
    * lists): the bottom-[[PRUNE_DROP]] by cohesion, ties to the lower
    * c_id. */
  private val PRUNE_DROP = 4L

  /** The SemDeDup-style curation loop composed END TO END (round 13,
    * r12 VERDICT stretch): the cluster-cards census (per-cluster
    * centroid-cosine cohesion — `q_cluster_cards`' geo leg) DECIDES —
    * the [[PRUNE_DROP]] least-cohesive clusters are dropped from the
    * inverted lists — and the ANN eval MEASURES what that curation cost:
    * the same IVF2 serving plan runs against the unpruned and the pruned
    * index side by side, recall@5 scored against the SHARED full-corpus
    * brute truth. Queries probe their [[NPROBE2]] nearest SURVIVING
    * centroids (rank recomputed after the drop — a pruned nearest list
    * must fall through to the next survivor, exactly what a serving
    * stack does after compaction). The two audit rows put the pruning
    * trade (index 25% smaller vs recall delta) on the oracle surface as
    * integers.
    *
    * Scale: census + prune rank run on the K-row cluster dictionary;
    * both serving arms are the standard IVF plan (broadcast survivor
    * dictionary onto the assign/probe sides, list equi-join, windowed
    * top-5) — no new corpus-sized operator anywhere. */
  def annPrunedRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val truth = bruteTruth(s, dir)
    val ranked = rankedAssign(s, dir)
    val e = quantized(s, dir)
    val cohesion = memberCos(s, dir).groupBy($"c_id")
      .agg(expr("sum(cq + 1000000) div count(1) - 1000000").as("cohesion_ppm"))
    // K-row dictionary rank — the pruning decision itself
    val wPr = Window.orderBy($"cohesion_ppm".asc, $"c_id".asc)
    val census = cohesion.withColumn("pr", row_number().over(wPr))
    def arm(variant: String, survive: DataFrame): DataFrame = {
      val assign = ranked.filter($"crn" === 1)
        .join(broadcast(survive), Seq("c_id"), "left_semi")
        .select($"vec_id", $"c_id".as("bucket"))
      val wQ = Window.partitionBy($"vec_id").orderBy($"crn".asc)
      val probes = ranked.filter($"vec_id" < 20)
        .join(broadcast(survive), Seq("c_id"), "left_semi")
        .withColumn("srn", row_number().over(wQ))
        .filter($"srn" <= NPROBE2)
        .select($"vec_id", $"c_id".as("bucket"))
        .join(e, Seq("vec_id"))
        .select($"vec_id".as("q_id"), $"qe".as("q_emb"),
          $"nrm".as("q_nrm"), $"bucket")
      val scored = probes.join(assign, Seq("bucket"))
        .filter($"vec_id" =!= $"q_id")
        .join(e, Seq("vec_id"))
        .select($"q_id", $"vec_id",
          cosine(dotQ($"q_emb", $"qe"), $"q_nrm", $"nrm").as("cos_sim"))
        .distinct()
      val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
      val preds = scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5).select($"q_id", $"vec_id")
      val stat = preds
        .join(truth.withColumn("hit", lit(1L)), Seq("q_id", "vec_id"), "left")
        .agg(count(lit(1)).as("n_pred"),
          coalesce(sum(coalesce($"hit", lit(0L))), lit(0L)).as("hits"))
      stat
        .crossJoin(broadcast(survive.agg(count(lit(1)).as("n_clusters"))))
        .crossJoin(broadcast(assign.agg(count(lit(1)).as("n_indexed"))))
        .select(lit(variant).as("variant"), $"n_clusters", $"n_indexed",
          $"n_pred", $"hits")
    }
    val all = census.select($"c_id")
    val surviving = census.filter($"pr" > PRUNE_DROP).select($"c_id")
    arm("pruned", surviving).unionByName(arm("unpruned", all))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
      .select($"variant", $"n_clusters", $"n_indexed", $"n_pred", $"hits",
        expr("(1000000 * hits) div n_truth").as("recall_ppm"))
      .orderBy($"variant")
  }

  /** DuckDB mirror: census + prune over the shared k-means CTEs, each
    * arm the [[knnIvf2Sql]] plan against its survivor set, brute truth
    * embedded scoped. Assembled by concatenation (embedded tier SQL). */
  lazy val annPrunedRecallSql: String = {
    def armSql(sfx: String, surv: String): String =
      s"""assign_$sfx AS (
         |  SELECT a.vec_id, a.c_id AS bucket FROM aranked3 a
         |  JOIN $surv s ON a.c_id = s.c_id WHERE a.crn = 1),
         |probes_$sfx AS (
         |  SELECT q_id, bucket FROM (
         |    SELECT a.vec_id AS q_id, a.c_id AS bucket,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY a.crn ASC) AS srn
         |    FROM aranked3 a JOIN $surv s ON a.c_id = s.c_id
         |    WHERE a.vec_id < 20) WHERE srn <= $NPROBE2),
         |cands_$sfx AS (
         |  SELECT DISTINCT p.q_id, a.vec_id
         |  FROM probes_$sfx p JOIN assign_$sfx a ON p.bucket = a.bucket
         |  WHERE a.vec_id <> p.q_id),
         |scored_$sfx AS (
         |  SELECT ca.q_id, ca.vec_id,
         |    CAST(${dotSql("q.embedding", "v.embedding")} AS DOUBLE)
         |      / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(vn.nrm AS DOUBLE))) AS cos_sim
         |  FROM cands_$sfx ca
         |  JOIN embeddings q ON ca.q_id = q.vec_id
         |  JOIN embeddings v ON ca.vec_id = v.vec_id
         |  JOIN norms qn ON ca.q_id = qn.vec_id
         |  JOIN norms vn ON ca.vec_id = vn.vec_id, $idxSql
         |  GROUP BY ca.q_id, ca.vec_id, qn.nrm, vn.nrm),
         |preds_$sfx AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
         |    FROM scored_$sfx) WHERE rnk <= 5),
         |row_$sfx AS (
         |  SELECT '$sfx' AS variant,
         |    CAST((SELECT COUNT(*) FROM $surv) AS BIGINT) AS n_clusters,
         |    CAST((SELECT COUNT(*) FROM assign_$sfx) AS BIGINT) AS n_indexed,
         |    CAST((SELECT COUNT(*) FROM preds_$sfx) AS BIGINT) AS n_pred,
         |    CAST((SELECT COUNT(*) FROM preds_$sfx p JOIN truth t
         |      ON p.q_id = t.q_id AND p.vec_id = t.vec_id) AS BIGINT) AS hits)""".stripMargin
    s"""WITH $kmeansCtesSql,
       |$mcosCteSql,
       |coh AS (
       |  SELECT c_id,
       |    CAST(SUM(cq + 1000000) // COUNT(*) - 1000000 AS BIGINT)
       |      AS cohesion_ppm
       |  FROM mcos GROUP BY c_id),
       |census AS (
       |  SELECT c_id, row_number() OVER (
       |    ORDER BY cohesion_ppm ASC, c_id ASC) AS pr FROM coh),
       |surv_all AS (SELECT c_id FROM census),
       |surv_kept AS (SELECT c_id FROM census WHERE pr > $PRUNE_DROP),
       |truth AS (SELECT q_id, vec_id FROM (
       |""".stripMargin + knnBruteSql + "\n) tt),\n" +
      armSql("pruned", "surv_kept") + ",\n" +
      armSql("unpruned", "surv_all") + "\n" +
      s"""SELECT variant, n_clusters, n_indexed, n_pred, hits,
         |  CAST((1000000 * hits) // (SELECT COUNT(*) FROM truth) AS BIGINT)
         |    AS recall_ppm
         |FROM (SELECT * FROM row_pruned UNION ALL SELECT * FROM row_unpruned)
         |ORDER BY variant""".stripMargin
  }

  /** The `members` + `mcos` CTE pair shared by the cluster-census
    * oracles (appended after [[kmeansCtesSql]]). */
  private val mcosCteSql: String =
    """members AS (SELECT vec_id, c_id FROM aranked3 WHERE crn = 1),
      |mcos AS (
      |  SELECT m.vec_id, m.c_id,
      |    CAST(floor(CAST(d.dot AS DOUBLE)
      |      / (sqrt(CAST(vn.nrm AS DOUBLE)) * sqrt(CAST(cn.cnrm AS DOUBLE)))
      |      * 1000000) AS BIGINT) AS cq
      |  FROM members m
      |  JOIN adots3 d ON d.vec_id = m.vec_id AND d.c_id = m.c_id
      |  JOIN norms vn ON m.vec_id = vn.vec_id
      |  JOIN c2_norm cn ON m.c_id = cn.c_id)""".stripMargin

  def clusterCards(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val members = rankedAssign(s, dir).filter($"crn" === 1)
      .select($"vec_id", $"c_id")
    val counts = members
      .join(Tables.embeddings(s, dir)
        .select($"vec_id", $"label".cast(LongType).as("label")), Seq("vec_id"))
      .groupBy($"c_id", $"label").agg(count(lit(1)).as("cnt"))
    val labelStats = counts.groupBy($"c_id").agg(
      sum($"cnt").as("n_vecs"),
      count(lit(1)).as("n_labels"),
      max($"cnt").as("top_cnt"),
      max_by($"label", $"cnt" * 1000000L - $"label").as("top_label"))
    val geo = memberCos(s, dir)
      .groupBy($"c_id").agg(
        max_by($"vec_id", $"cq" * ID_STRIDE - $"vec_id").as("medoid_id"),
        expr("sum(cq + 1000000) div count(1) - 1000000").as("cohesion_ppm"))
    labelStats.join(geo, Seq("c_id"))
      .select($"c_id", $"n_vecs", $"n_labels", $"top_label",
        expr("(top_cnt * 10000) div n_vecs").as("purity_bp"),
        $"medoid_id", $"cohesion_ppm")
      .orderBy($"c_id")
  }

  val clusterCardsSql: String =
    s"""WITH $kmeansCtesSql,
       |$mcosCteSql,
       |lcounts AS (
       |  SELECT m.c_id, CAST(e.label AS BIGINT) AS label, COUNT(*) AS cnt
       |  FROM members m JOIN embeddings e ON m.vec_id = e.vec_id
       |  GROUP BY 1, 2),
       |lstats AS (
       |  SELECT c_id, CAST(SUM(cnt) AS BIGINT) AS n_vecs,
       |    CAST(COUNT(*) AS BIGINT) AS n_labels,
       |    CAST(MAX(cnt) AS BIGINT) AS top_cnt,
       |    arg_max(label, cnt * 1000000 - label) AS top_label
       |  FROM lcounts GROUP BY c_id),
       |geo AS (
       |  SELECT c_id,
       |    arg_max(vec_id, cq * $ID_STRIDE - vec_id) AS medoid_id,
       |    CAST(SUM(cq + 1000000) // COUNT(*) - 1000000 AS BIGINT)
       |      AS cohesion_ppm
       |  FROM mcos GROUP BY c_id)
       |SELECT l.c_id, l.n_vecs, l.n_labels, l.top_label,
       |  CAST((l.top_cnt * 10000) // l.n_vecs AS BIGINT) AS purity_bp,
       |  g.medoid_id, g.cohesion_ppm
       |FROM lstats l JOIN geo g ON l.c_id = g.c_id
       |ORDER BY l.c_id""".stripMargin

  // --- X3s: embedding-space outlier pruning census ----------------------

  /** X3s — embedding-space OUTLIER census, the pruning signal a curation
    * pass applies after clustering (mislabeled/noise/off-distribution
    * examples sit far from every centroid): per cluster, members whose
    * cosine-to-own-centroid is more than 2σ BELOW the cluster mean —
    * |z| > 2 on the low side — counted and worst-cased.
    *
    * Exact-integer z-test: from the quantized per-member cq, the cluster
    * keeps (n, Σcq, Σcq²) as exact longs; mean m = floor(Σcq/n) (true
    * floor on either sign — [[floorDivMean]]/[[floorDivSql]]); the
    * centered second moment `var_num = Σcq² − 2m·Σcq + n·m²` equals
    * Σ(cq−m)² exactly, so "z² > 4" is the pure integer comparison
    * `(m−cq)²·n > 4·var_num` with no division, no sqrt, no rounding
    * rule — bit-identical in both engines by construction. (Σcq² tops
    * out at n·10¹² — safe in 64-bit to ~10⁶ members per cluster; past
    * that the same sums go through DECIMAL, the ST3 discipline.)
    *
    * Scale shape: TWO aggregates over the shared [[memberCos]] relation
    * (stats, then flag-and-count after a K-row broadcast join back) —
    * the corpus is touched once, K stays constant, nothing all-pairs.
    *
    * On the synthetic corpus (near-uniform on the sphere, no planted
    * noise) the honest answer at 2σ IS zero flags — the distribution's
    * tails are bounded and the per-cluster max low-side z² measures
    * 1.5–3.3 (emitted as `max_low_z2_centi`, the frontier the curator
    * reads against the bar). ExtSpec plants a far-off member through
    * [[outlierCensusOf]] and proves the flag fires. */
  /** The census over ANY (c_id, vec_id, cq) relation — shared by the
    * query (real member cosines, where a clean corpus honestly yields
    * zero flags) and the ExtSpec fixture that PLANTS an outlier to prove
    * the flag fires. `max_low_z2_centi` (the largest low-side z² in
    * hundredths) is the measured frontier, so the row carries signal
    * even when nothing crosses the 2σ bar. */
  private[graft] def outlierCensusOf(mc: DataFrame): DataFrame = {
    import mc.sparkSession.implicits._
    val stats = mc.groupBy($"c_id").agg(
      count(lit(1)).as("n"), sum($"cq").as("s1"),
      sum($"cq" * $"cq").as("s2"))
      .select($"c_id", $"n", $"s1", $"s2",
        floorDivMean($"s1", $"n").as("m"))
      .select($"c_id", $"n", $"m",
        ($"s2" - lit(2L) * $"m" * $"s1" + $"n" * $"m" * $"m").as("var_num"))
    mc.join(broadcast(stats), Seq("c_id"))
      .select($"c_id", $"vec_id", $"cq", $"n", $"m",
        (($"cq" < $"m") &&
          (($"m" - $"cq") * ($"m" - $"cq") * $"n" > lit(4L) * $"var_num"))
          .as("out"),
        when($"cq" < $"m" && $"var_num" > 0L,
          expr("((m - cq) * (m - cq) * n * 100) div var_num"))
          .otherwise(0L).as("z2c"))
      .groupBy($"c_id").agg(
        max($"n").as("n_vecs"),
        max($"m").as("mean_cq"),
        sum(when($"out", 1L).otherwise(0L)).as("n_outliers"),
        max($"z2c").as("max_low_z2_centi"),
        max_by($"vec_id", -($"cq" * ID_STRIDE) - $"vec_id").as("worst_id"),
        min($"cq").as("worst_cq"))
      .select($"c_id", $"n_vecs", $"mean_cq", $"n_outliers",
        expr("(n_outliers * 10000) div n_vecs").as("outlier_bp"),
        $"max_low_z2_centi", $"worst_id", $"worst_cq")
      .orderBy($"c_id")
  }

  def embedOutliers(s: SparkSession, dir: String): DataFrame =
    outlierCensusOf(memberCos(s, dir))

  val embedOutliersSql: String =
    s"""WITH $kmeansCtesSql,
       |$mcosCteSql,
       |stats AS (
       |  SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(cq) AS BIGINT) AS s1,
       |    CAST(SUM(cq * cq) AS BIGINT) AS s2
       |  FROM mcos GROUP BY c_id),
       |means AS (
       |  SELECT c_id, n, CAST(${floorDivSql("s1", "n")} AS BIGINT) AS m,
       |    s1, s2 FROM stats),
       |vars AS (
       |  SELECT c_id, n, m, s2 - 2 * m * s1 + n * m * m AS var_num
       |  FROM means),
       |flagged AS (
       |  SELECT mc.c_id, mc.vec_id, mc.cq, v.n, v.m,
       |    (mc.cq < v.m AND
       |     (v.m - mc.cq) * (v.m - mc.cq) * v.n > 4 * v.var_num) AS outl,
       |    CASE WHEN mc.cq < v.m AND v.var_num > 0
       |      THEN ((v.m - mc.cq) * (v.m - mc.cq) * v.n * 100) // v.var_num
       |      ELSE 0 END AS z2c
       |  FROM mcos mc JOIN vars v ON mc.c_id = v.c_id)
       |SELECT c_id, MAX(n) AS n_vecs, CAST(MAX(m) AS BIGINT) AS mean_cq,
       |  CAST(SUM(CASE WHEN outl THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |  CAST((SUM(CASE WHEN outl THEN 1 ELSE 0 END) * 10000) // MAX(n)
       |    AS BIGINT) AS outlier_bp,
       |  CAST(MAX(z2c) AS BIGINT) AS max_low_z2_centi,
       |  arg_max(vec_id, -(cq * $ID_STRIDE) - vec_id) AS worst_id,
       |  CAST(MIN(cq) AS BIGINT) AS worst_cq
       |FROM flagged GROUP BY c_id ORDER BY c_id""".stripMargin

  /** X3v (round 20) — the trained index's K GROWTH-LAW audit row: corpus
    * size, the law's K ([[ivfK]] — max(16, ceil(n/target))), the trained
    * index's actual non-empty list count, and the max/avg list
    * occupancy. This puts the r20 "K scales with the corpus" contract ON
    * THE ORACLE SURFACE: both engines derive every value from the data
    * (the oracle re-computes the law in SQL and re-runs the Lloyd chain),
    * so a regression to a fixed K — or a drifted ceil — hash-mismatches
    * at the first sweep tier past the floor regime instead of living
    * only in a unit spec. avg_list ≲ target is the flat-per-query-probe
    * property the serving tier's cost model rests on. */
  def annIndexK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kLaw = ivfK(embCount(s, dir))
    rankedAssign(s, dir).filter($"crn" === 1)
      .groupBy($"c_id").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_lists"), sum($"sz").as("n_vecs"),
        max($"sz").as("max_list"),
        expr("sum(sz) div count(1)").as("avg_list"))
      .select(lit(kLaw.toLong).as("k_law"), $"n_lists", $"n_vecs",
        $"max_list", $"avg_list")
  }

  val annIndexKSql: String =
    s"""WITH $kmeansCtesSql,
       |assign AS (SELECT vec_id, c_id FROM aranked3 WHERE crn = 1),
       |sizes AS (SELECT c_id, COUNT(*) AS sz FROM assign GROUP BY 1)
       |SELECT (SELECT ${ivfKSql("COUNT(*)")} FROM embeddings) AS k_law,
       |  COUNT(*) AS n_lists,
       |  CAST(SUM(sz) AS BIGINT) AS n_vecs,
       |  CAST(MAX(sz) AS BIGINT) AS max_list,
       |  CAST(SUM(sz) // COUNT(*) AS BIGINT) AS avg_list
       |FROM sizes""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_ann_index_k", annIndexK, Some(annIndexKSql),
      "X3v trained-index K growth-law audit: law K, non-empty lists, max/avg occupancy"),
    QueryDef("q_centroid_drift", centroidDrift, Some(centroidDriftSql),
      "X3t index-version drift: cohort-trained centroid sets aligned by quantized cosine + mutual-match flag"),
    QueryDef("q_embed_outliers", embedOutliers, Some(embedOutliersSql),
      "X3s embedding-space outlier census: integer 2-sigma low-side z-test per cluster, no division"),
    QueryDef("q_cluster_cards", clusterCards, Some(clusterCardsSql),
      "X3r per-cluster curation cards: size, label purity, packed-key medoid, quantized cohesion"),
    QueryDef("q_ann_opq", annOpq, Some(annOpqSql),
      "X3k OPQ transform search: PQ recall audit under identity/interleave/snake/learned-Givens-rotation"),
    QueryDef("q_ann_range", annRange, Some(annRangeSql),
      "X3o range (radius) search: thresholded set via brute + IVF-probed arms, per-query recall audit"),
    QueryDef("q_sim_knn_filtered", knnFiltered, Some(knnFilteredSql),
      "X3m filtered ANN: top-5 under a metadata predicate via PRE-filtered inverted lists, selectivity-adaptive nprobe"),
    QueryDef("q_sim_knn_filtered_audit", knnFilteredAudit, Some(knnFilteredAuditSql),
      "X3m' filtered-ANN audit: measured selectivity, chosen nprobe, recall vs filtered-brute truth at two predicate tiers"),
    QueryDef("q_ann_frontier", annFrontier, Some(annFrontierSql),
      "X3j IVF nprobe recall/cost frontier: one audit row per probe depth vs brute truth"),
    QueryDef("q_ann_rerank_frontier", annRerankFrontier,
      Some(annRerankFrontierSql),
      "X3q ADC rerank-depth frontier: recall vs exact-read budget C, one candidate join for all depths"),
    QueryDef("q_ann_matryoshka", annMatryoshka, Some(annMatryoshkaSql),
      "X3v matryoshka recall frontier: brute search over embedding prefixes (8/16/32 of 64 dims) vs full-d truth"),
    QueryDef("q_ann_pruned_recall", annPrunedRecall, Some(annPrunedRecallSql),
      "X3u SemDeDup loop closed: cohesion-census prune of IVF lists, recall@5 delta vs unpruned under shared brute truth"),
    QueryDef("q_ann_eval", annEval, Some(annEvalSql),
      "X3i ANN audit: integer-ppm recall@5 of LSH/IVF/IVF2/SQ8/PQ vs shared brute truth"),
    QueryDef("q_ann_delete_eval", annDeleteEval, Some(annDeleteEvalSql),
      "X3n delete-path audit: tombstone-filtered IVF vs survivor-retrained IVF vs survivor brute truth"),
    QueryDef("q_sim_knn_pq", knnPq, Some(knnPqSql),
      "X3h product-quantization ANN: Lloyd-refined 8x16 codebooks, ADC scan, exact re-rank"),
    QueryDef("q_sim_knn_ivfpq", knnIvfPq, Some(knnIvfPqSql),
      "X3l composed IVF-PQ ANN: coarse-quantizer pruning + ADC scan of probed lists"),
    QueryDef("q_sim_knn_brute", knnBrute, Some(knnBruteSql),
      "X3 brute-force cosine top-k (correctness baseline)"),
    QueryDef("q_sim_knn_lsh", knnLsh, Some(knnLshSql),
      "X3 hyperplane-LSH bucketed ANN (scale path)"),
    QueryDef("q_sim_knn_ivf", knnIvf, Some(knnIvfSql),
      "X3 IVF-flat ANN: coarse quantizer + nprobe re-rank"),
    QueryDef("q_sim_knn_ivf2", knnIvf2, Some(knnIvf2Sql),
      "X3 IVF ANN with learned centroids: bounded k-means refinement + nprobe re-rank"),
    QueryDef("q_sim_knn_sq8", knnSq8, Some(knnSq8Sql),
      "X3 SQ8 scalar-quantized ANN: int8 code scan + exact re-rank"),
    QueryDef("q_embed_dimstats", embedDimStats, Some(embedDimStatsSql),
      "X3d per-dimension feature stats (z-score fit) from exact integer moments"),
    QueryDef("q_embed_normalize", embedNormalize, Some(embedNormalizeSql),
      "X3d' apply the z-score fit: broadcast fit + narrow transform"),
    QueryDef("q_sim_neardup_label", nearDupByLabel, Some(nearDupByLabelSql),
      "X3/X2 label-blocked embedding near-dup pairs"),
    QueryDef("q_dedup_semantic", semanticDedup, Some(semanticDedupSql),
      "X2g label-free semantic near-dup blocked by learned IVF centroids"))
}
