#!/usr/bin/env python3
"""Probe the INSTALLED DuckDB for every scalar convention the oracle SQL
relies on, and print one `name<TAB>rendered-value` line per probe plus a
`version<TAB>...` header.

Why this exists (round 18, VERDICT r17 item 2): the 263 oracle queries
are written against conventions probed on DuckDB 1.0.0 — strcmp95
jaro_winkler (integer t/2 transpositions, blank input = 0), `//`
truncation semantics, 1-based list lambdas, strpos on empty needles,
NULLS LAST default sort, uppercase hex(), HUGEINT integer SUM, and the
rounding family. Nothing in the gate fails if the environment's DuckDB
is upgraded and silently changes one of these — the first symptom would
be an unexplained hash drift in some unrelated query. OracleConventionSpec
runs this probe at `sbt test` time and asserts the rendered values, so an
engine upgrade flips a NAMED spec with the exact convention that moved.

Dev/test tool only — NOT part of the Spark library.
"""
import duckdb

# name -> scalar SQL. Each probe isolates ONE convention; the expected
# rendered values live in OracleConventionSpec (the Scala side owns the
# pin so that `sbt test` is the tripwire).
PROBES = [
    # jaro_winkler: DuckDB implements Winkler's original strcmp95 —
    # transpositions are integer t/2 of half the out-of-order matches,
    # and ANY blank input scores 0 (not 1 for blank==blank).
    ("jw_blank_blank", "CAST(round(jaro_winkler_similarity('', ''), 6) AS VARCHAR)"),
    ("jw_blank_a", "CAST(round(jaro_winkler_similarity('', 'a'), 6) AS VARCHAR)"),
    # odd out-of-order count: 3 mismatched positions -> t = 3/2 = 1 (int)
    ("jw_odd_transpose", "CAST(round(jaro_winkler_similarity('abcde', 'abdec'), 6) AS VARCHAR)"),
    ("jw_martha", "CAST(round(jaro_winkler_similarity('martha', 'marhta'), 6) AS VARCHAR)"),
    # `//` is integer division; the convention on negatives decides every
    # bucketing expression shared between the engines.
    ("intdiv_neg", "CAST(-7 // 2 AS VARCHAR)"),
    ("intdiv_pos", "CAST(7 // 2 AS VARCHAR)"),
    ("mod_neg", "CAST(-7 % 2 AS VARCHAR)"),
    # 1-based list indexing and 1-based lambda index argument.
    ("list_index_first", "CAST([10, 20, 30][1] AS VARCHAR)"),
    ("list_index_zero", "CAST([10, 20, 30][0] IS NULL AS VARCHAR)"),
    ("list_lambda_base",
     "array_to_string(list_transform([7, 7], (x, i) -> CAST(i AS VARCHAR)), ',')"),
    ("list_slice_bounds", "array_to_string([1, 2, 3, 4][2:3], ',')"),
    # strpos edge cases: empty needle, absent needle, empty haystack.
    ("strpos_empty_needle", "CAST(strpos('abc', '') AS VARCHAR)"),
    ("strpos_absent", "CAST(strpos('abc', 'z') AS VARCHAR)"),
    ("strpos_empty_hay", "CAST(strpos('', 'a') AS VARCHAR)"),
    # substring 1-based start; 0 and negative starts have engine-specific
    # clamping that several scrub oracles lean on.
    ("substr_one_based", "substring('abcdef', 2, 3)"),
    ("substr_zero_start", "substring('abcdef', 0, 3)"),
    ("substr_neg_start", "substring('abcdef', -2, 3)"),
    # Default sort order places NULLs LAST (Spark defaults FIRST — every
    # oracle spells it explicitly, but the default is what the probe set
    # was calibrated against).
    ("nulls_default_last",
     "(SELECT string_agg(coalesce(CAST(v AS VARCHAR), 'N'), ',' ORDER BY v) "
     "FROM (VALUES (2), (NULL), (1)) t(v))"),
    # hex() renders uppercase.
    ("hex_case", "hex(255)"),
    # Integer SUM widens to HUGEINT (arrow decimal128(38,0)) — the trap
    # behind every CAST(... AS BIGINT) in the oracle SQL.
    ("sum_int_type", "(SELECT typeof(sum(x)) FROM (VALUES (1)) t(x))"),
    ("count_type", "(SELECT typeof(count(*)) FROM (VALUES (1)) t(x))"),
    # round() on DOUBLE uses half-even-free libm semantics; on DECIMAL it
    # is half-up. Both appear in oracle mirrors via explicit casts.
    ("round_double_half", "CAST(round(CAST(2.5 AS DOUBLE), 0) AS VARCHAR)"),
    ("round_decimal_half", "CAST(round(CAST(2.5 AS DECIMAL(3,1)), 0) AS VARCHAR)"),
    ("round_neg_half", "CAST(round(CAST(-2.5 AS DOUBLE), 0) AS VARCHAR)"),
    # CAST double -> int rounds (Spark truncates; mirrors always floor/
    # truncate explicitly — pin the reason that discipline exists).
    ("cast_double_int", "CAST(CAST(2.7 AS DOUBLE)::BIGINT AS VARCHAR)"),
    # Unicode length semantics: length() counts code points.
    ("length_codepoints", "CAST(length('aé€') AS VARCHAR)"),
    # Wide-DECIMAL -> DOUBLE casts are NOT correctly rounded (the int128
    # mantissa converts before the 10^scale division — double rounding),
    # while the VARCHAR round-trip is exact-decimal -> correctly-rounded
    # strtod. This pair is WHY every decimal-SUM oracle casts through
    # VARCHAR (round 19): Spark's Decimal.toDouble goes through
    # BigDecimal.doubleValue, which is correctly rounded, so the direct
    # cast drifts 1 ulp on boundary sums (seen once in the r18 sf1 sweep).
    ("dec_double_direct",
     "CAST(CAST(CAST('27845339640.098010' AS DECIMAL(38,6)) AS DOUBLE) AS VARCHAR)"),
    ("dec_double_via_varchar",
     "CAST(CAST(CAST(CAST('27845339640.098010' AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS VARCHAR)"),
    # HUGEINT -> DOUBLE via VARCHAR is likewise the correctly-rounded
    # path the regression-fit mirror uses for its 128-bit statistics.
    ("hugeint_double_via_varchar",
     "CAST(CAST(CAST(CAST('27845339640098010' AS HUGEINT) AS VARCHAR) AS DOUBLE) AS VARCHAR)"),
    # md5() of empty string — the seed of every deterministic sampler.
    ("md5_empty", "md5('')"),
    # epoch microseconds conversion used by every timestamp mirror.
    ("epoch_us", "CAST(epoch_us(TIMESTAMP '1970-01-01 00:00:01') AS VARCHAR)"),
]


def main():
    print(f"version\t{duckdb.__version__}")
    con = duckdb.connect()
    for name, sql in PROBES:
        try:
            val = con.execute(f"SELECT {sql}").fetchone()[0]
            rendered = "NULL" if val is None else str(val)
        except Exception as e:  # a probe erroring IS a convention change
            rendered = f"ERROR:{type(e).__name__}"
        print(f"{name}\t{rendered}")


if __name__ == "__main__":
    main()
