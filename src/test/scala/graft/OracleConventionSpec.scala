package graft

import org.scalatest.funsuite.AnyFunSuite

/** The DuckDB-convention tripwire (round 18, VERDICT r17 item 2).
  *
  * Every oracle query is written against scalar conventions probed on
  * DuckDB 1.0.0: strcmp95 `jaro_winkler_similarity` (integer t/2
  * transpositions, blank input = 0), `//` truncating toward zero on
  * negatives, 1-based list indexing AND 1-based lambda index arguments,
  * `strpos` returning 1 on an empty needle and 0 on an empty haystack,
  * default NULLS LAST ordering, uppercase `hex()`, integer SUM widening
  * to HUGEINT (the reason for every `CAST(... AS BIGINT)` in the oracle
  * SQL), half-up DECIMAL rounding vs double rounding, double→int casts
  * ROUNDING (where Spark truncates), code-point `length()`, and the
  * md5/epoch_us primitives under every deterministic sampler and
  * timestamp mirror.
  *
  * Until this spec, nothing failed if the environment's DuckDB changed —
  * the first symptom of an engine upgrade would have been an unexplained
  * hash drift in some unrelated query at driver time. Now `sbt test`
  * runs `tools/oracle_conventions.py` against the INSTALLED DuckDB and
  * asserts every probed value, so a convention that moves flips a NAMED
  * assertion carrying the probe name, the expected value, and the
  * installed engine version.
  *
  * Deliberate choice: the pin is on the CONVENTION VALUES, not on the
  * version string — an upgrade that preserves all 28 conventions leaves
  * the oracle gate genuinely sound and should stay green; the version is
  * asserted non-empty and printed into every failure message so a
  * flipped probe immediately identifies the engine that flipped it.
  * On a box without python3+duckdb the spec is CANCELED (assume), never
  * silently green — mirroring OracleBudgetSpec.
  */
class OracleConventionSpec extends AnyFunSuite {

  private def duckdbAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb")
        .redirectErrorStream(true).start()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  /** Values captured from DuckDB 1.0.0 — the engine the whole oracle
    * gate was calibrated against. A differing value here means the
    * corresponding convention moved under the 263 oracles' feet.
    */
  private val pinned: Seq[(String, String)] = Seq(
    "jw_blank_blank" -> "0.0",
    "jw_blank_a" -> "0.0",
    "jw_odd_transpose" -> "0.893333", // t = 3/2 = 1 (INTEGER half)
    "jw_martha" -> "0.961111",
    "intdiv_neg" -> "-3", // `//` truncates toward zero, NOT floor (-4)
    "intdiv_pos" -> "3",
    "mod_neg" -> "-1", // sign follows the dividend
    "list_index_first" -> "10", // 1-based
    "list_index_zero" -> "true", // [0] is NULL, not an error
    "list_lambda_base" -> "1,2", // lambda index argument is 1-based
    "list_slice_bounds" -> "2,3", // [2:3] inclusive both ends, 1-based
    "strpos_empty_needle" -> "1",
    "strpos_absent" -> "0",
    "strpos_empty_hay" -> "0",
    "substr_one_based" -> "bcd",
    "substr_zero_start" -> "ab", // start 0 clamps: yields chars 1..2
    "substr_neg_start" -> "ef", // negative start counts from the end
    "nulls_default_last" -> "1,2,N",
    "hex_case" -> "FF", // uppercase
    "sum_int_type" -> "HUGEINT", // the CAST(... AS BIGINT) trap
    "count_type" -> "BIGINT",
    "round_double_half" -> "3.0",
    "round_decimal_half" -> "3", // DECIMAL rounds half-up
    "round_neg_half" -> "-3.0", // half away from zero, not half-even
    "cast_double_int" -> "3", // double→int ROUNDS (Spark truncates)
    "length_codepoints" -> "3",
    // wide-DECIMAL → DOUBLE misrounds 1 ulp (double rounding through the
    // int128 mantissa); the VARCHAR round-trip is correctly rounded —
    // the round-19 reason every decimal-SUM oracle casts through VARCHAR
    "dec_double_direct" -> "27845339640.098007",
    "dec_double_via_varchar" -> "27845339640.09801",
    "hugeint_double_via_varchar" -> "2.784533964009801e+16",
    "md5_empty" -> "d41d8cd98f00b204e9800998ecf8427e",
    "epoch_us" -> "1000000"
  )

  test("installed DuckDB matches every convention the oracle SQL is calibrated to") {
    assume(duckdbAvailable, "python3+duckdb not on this box; driver gate covers it")
    val pb = new ProcessBuilder("python3", "tools/oracle_conventions.py")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    assert(rc == 0, s"convention probe failed to run:\n$out")
    val lines = out.linesIterator.filter(_.contains("\t")).map { l =>
      val Array(k, v) = l.split("\t", 2); (k, v)
    }.toMap
    val version = lines.getOrElse("version", "")
    assert(version.nonEmpty, s"probe did not report a DuckDB version:\n$out")
    info(s"installed DuckDB: $version")
    val drifted = pinned.flatMap { case (name, want) =>
      lines.get(name) match {
        case Some(got) if got == want => None
        case Some(got) =>
          Some(s"$name: pinned '$want' (DuckDB 1.0.0) but installed " +
            s"DuckDB $version returns '$got'")
        case None =>
          Some(s"$name: probe missing from output (DuckDB $version)")
      }
    }
    assert(drifted.isEmpty,
      s"ORACLE CONVENTION DRIFT under DuckDB $version — the oracle SQL " +
        s"gate is no longer calibrated to this engine. Re-probe every " +
        s"affected oracle before trusting hash results.\n" +
        drifted.mkString("\n"))
    // every pinned probe must have been exercised (no silent shrinkage of
    // the probe set on the python side)
    assert(lines.size - 1 >= pinned.size,
      s"probe set shrank: ${lines.size - 1} probes ran, ${pinned.size} pinned")
  }
}
