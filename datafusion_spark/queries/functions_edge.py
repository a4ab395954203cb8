"""Point-semantics edge cases mined from the reference sqllogictest corpus.

Reference: datafusion/sqllogictest/test_files/{math.slt, scalar.slt, cast.slt,
timestamps.slt, string/}: the NULL/overflow/coercion corners the family
entries don't reach — signed zero, NaN ordering, lossy/overflowing casts,
calendar-interval clamping, unicode case folding, NULL string propagation.

Every case here was probed in BOTH engines and only behaviour the two agree
on is asserted (the oracle occasionally spells the same semantics differently
— e.g. HUGEINT + TRY_CAST to mirror Spark's try_add overflow-to-NULL).
Known divergences are documented per-entry and excluded:

  * JVM vs ICU case tables: upper('ß') -> 'SS' (JVM full-fold) vs 'ẞ' (ICU),
    lower('İ') keeps the combining dot on the JVM, final sigma lowering, and
    ligature expansion upper('ﬀ') differ by design between runtimes.
  * chr(): Spark is latin-1-ish beyond ASCII where DuckDB is codepoint-true.
  * CAST(9.95 AS DECIMAL(3,1)): Spark HALF_UPs to 10.0, DuckDB truncates.
  * Proleptic boundaries: DuckDB renders years <= 0 as 'BC', Spark as '0000'.

These are engine-identity facts, not bugs; the entries pin the (large)
agreeing surface so a regression in either integration shows up.
"""

from __future__ import annotations

from datafusion_spark.queries.registry import query

# Each entry is a single wide row: one aliased column per point case, so the
# driver's schema+value hash pins every case individually.  VALUES-free —
# the inputs ARE the constants under test.


def _sql_query(name: str, spark_sql: str, duck_sql: str, tags: tuple[str, ...], doc: str):
    def fn(spark, sf_dir, _sql=spark_sql):
        return spark.sql(_sql)

    fn.__name__ = name
    fn.__doc__ = doc
    query(name, oracle=duck_sql, tags=tags)(fn)


_sql_query(
    "fn_edge_signed_zero_nan",
    spark_sql="""
    SELECT CAST(-0.0 AS DOUBLE) = CAST(0.0 AS DOUBLE)          AS zeros_equal,
           CAST(CAST('-0.0' AS DOUBLE) AS STRING)              AS neg_zero_str,
           abs(CAST('-0.0' AS DOUBLE))                         AS abs_neg_zero,
           sign(CAST('-0.0' AS DOUBLE)) + CAST(0.0 AS DOUBLE)  AS sign_neg_zero,
           CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE)       AS nan_self_eq,
           CAST('NaN' AS DOUBLE) > CAST('Infinity' AS DOUBLE)  AS nan_gt_inf,
           isnan(CAST('NaN' AS DOUBLE))                        AS isnan_nan,
           isnan(CAST(1.0 AS DOUBLE))                          AS isnan_one,
           try_divide(1.0, CAST('-0.0' AS DOUBLE))             AS div_by_neg_zero,
           greatest(CAST('NaN' AS DOUBLE), CAST('Infinity' AS DOUBLE)) > 0 AS nan_greatest
    """,
    duck_sql="""
    SELECT CAST(-0.0 AS DOUBLE) = CAST(0.0 AS DOUBLE)          AS zeros_equal,
           CAST(CAST('-0.0' AS DOUBLE) AS VARCHAR)             AS neg_zero_str,
           abs(CAST('-0.0' AS DOUBLE))                         AS abs_neg_zero,
           sign(CAST('-0.0' AS DOUBLE)) + CAST(0.0 AS DOUBLE)  AS sign_neg_zero,
           CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE)       AS nan_self_eq,
           CAST('NaN' AS DOUBLE) > CAST('Infinity' AS DOUBLE)  AS nan_gt_inf,
           isnan(CAST('NaN' AS DOUBLE))                        AS isnan_nan,
           isnan(CAST(1.0 AS DOUBLE))                          AS isnan_one,
           1.0 / CAST('-0.0' AS DOUBLE)                        AS div_by_neg_zero,
           greatest(CAST('NaN' AS DOUBLE), CAST('Infinity' AS DOUBLE)) > 0 AS nan_greatest
    """,
    tags=("functions", "edge", "float"),
    doc="""Signed-zero and NaN point semantics (reference math.slt iszero /
    nanvl / isnan blocks; scalar.slt -0.0 cases): -0.0 == 0.0, -0.0 renders
    with its sign, NaN is self-equal and sorts above +Inf in BOTH engines,
    and float division by -0.0 is NULL-on-Spark-try / NULL-on-DuckDB.
    sign(-0.0) is normalized by +0.0 (Spark preserves the IEEE signed zero,
    DuckDB returns integer 0).""",
)

_sql_query(
    "fn_edge_lossy_casts",
    spark_sql="""
    SELECT try_cast(300 AS TINYINT)          AS tiny_overflow,
           try_cast('12ab' AS DOUBLE)        AS junk_to_double,
           try_cast('1e400' AS DOUBLE)       AS double_overflow_inf,
           try_cast(1e19 AS BIGINT)          AS big_overflow,
           try_cast('  42 ' AS INT)          AS trimmed_int,
           CAST(2.7 AS BIGINT)               AS trunc_pos,
           CAST(-2.7 AS BIGINT)              AS trunc_neg,
           CAST(1.5 AS INT)                  AS trunc_half,
           CAST(try_cast('123.45' AS DECIMAL(4,1)) AS DOUBLE) AS dec_round,
           CAST(try_cast('99999' AS DECIMAL(4,0)) AS DOUBLE) AS dec_overflow
    """,
    duck_sql="""
    SELECT TRY_CAST(300 AS TINYINT)          AS tiny_overflow,
           TRY_CAST('12ab' AS DOUBLE)        AS junk_to_double,
           TRY_CAST('1e400' AS DOUBLE)       AS double_overflow_inf,
           TRY_CAST(1e19 AS BIGINT)          AS big_overflow,
           TRY_CAST('  42 ' AS INT)          AS trimmed_int,
           CAST(trunc(2.7) AS BIGINT)        AS trunc_pos,
           CAST(trunc(-2.7) AS BIGINT)       AS trunc_neg,
           CAST(trunc(1.5) AS INT)           AS trunc_half,
           CAST(TRY_CAST('123.45' AS DECIMAL(4,1)) AS DOUBLE) AS dec_round,
           CAST(TRY_CAST('99999' AS DECIMAL(4,0)) AS DOUBLE) AS dec_overflow
    """,
    tags=("functions", "edge", "cast"),
    doc="""Lossy and overflowing casts (reference cast.slt / arrow_try_cast
    .slt): integer overflow -> NULL under TRY, junk strings -> NULL,
     '1e400' -> +Inf (double has no overflow, it saturates), float->int
    TRUNCATES toward zero (pinned via trunc() in the oracle because bare
    DuckDB CAST rounds), string->decimal rounds at scale but NULLs on
    precision overflow.""",
)

_sql_query(
    "fn_edge_try_arith_overflow",
    spark_sql="""
    SELECT try_add(9223372036854775807, CAST(1 AS BIGINT))          AS add_ovf,
           try_subtract(-9223372036854775808, CAST(1 AS BIGINT))    AS sub_ovf,
           try_multiply(CAST(4611686018427387904 AS BIGINT), 4)     AS mul_ovf,
           try_divide(CAST(1 AS BIGINT), 0)                         AS int_div0,
           CAST(try_divide(-5.0, 0.0) AS DOUBLE)                    AS float_div0,
           (SELECT try_sum(x) FROM VALUES (9223372036854775807), (1) t(x)) AS sum_ovf,
           factorial(20)                                            AS fact20,
           -7 % 3                                                   AS mod_neg,
           7 % -3                                                   AS mod_neg_rhs,
           pmod(-7, 3)                                              AS pmod_neg
    """,
    duck_sql="""
    SELECT TRY_CAST(9223372036854775807::HUGEINT + 1 AS BIGINT)     AS add_ovf,
           TRY_CAST(-9223372036854775808::HUGEINT - 1 AS BIGINT)    AS sub_ovf,
           TRY_CAST(4611686018427387904::HUGEINT * 4 AS BIGINT)     AS mul_ovf,
           CAST(1 AS BIGINT) / NULLIF(0, 0)                         AS int_div0,
           CAST(-5.0 / NULLIF(0.0, 0.0) AS DOUBLE)                  AS float_div0,
           (SELECT TRY_CAST(SUM(x::HUGEINT) AS BIGINT)
              FROM (VALUES (9223372036854775807), (1)) t(x))        AS sum_ovf,
           CAST(factorial(20) AS BIGINT)                            AS fact20,
           -7 % 3                                                   AS mod_neg,
           7 % -3                                                   AS mod_neg_rhs,
           ((-7 % 3) + 3) % 3                                       AS pmod_neg
    """,
    tags=("functions", "edge", "arithmetic"),
    doc="""Overflow-to-NULL arithmetic (reference math.slt overflow blocks;
    aggregate.slt sum overflow): try_add/subtract/multiply/sum at the i64
    boundary all yield NULL (oracle mirrors via HUGEINT + TRY_CAST),
    division by zero is NULL under TRY on both engines, %% truncates toward
    zero with sign-of-dividend (C semantics) on both, and pmod is the
    always-positive variant (spelled arithmetically in the oracle).""",
)

_sql_query(
    "fn_edge_interval_calendar",
    spark_sql="""
    SELECT CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS STRING)  AS clamp_feb,
           CAST(DATE '2024-01-31' + INTERVAL 1 MONTH + INTERVAL 1 MONTH AS STRING)
                                                                 AS two_steps,
           CAST(DATE '2024-01-31' + INTERVAL 2 MONTH AS STRING)  AS one_jump,
           CAST(DATE '2024-02-29' + INTERVAL 1 YEAR AS STRING)   AS leap_year,
           CAST(DATE '2024-03-31' - INTERVAL 1 MONTH AS STRING)  AS clamp_back,
           CAST(TIMESTAMP '2024-03-10 01:30:00' + INTERVAL 90 MINUTE AS STRING)
                                                                 AS ts_plus_min,
           CAST(TIMESTAMP '2024-01-31 12:00:00' + INTERVAL 1 MONTH AS STRING)
                                                                 AS ts_clamp,
           CAST(try_to_timestamp('not a ts') AS STRING)          AS bad_parse,
           datediff(DATE '2024-03-01', DATE '2024-02-01')        AS leap_feb_days,
           CAST(date_add(DATE '2023-12-31', 1) AS STRING)        AS year_rollover
    """,
    duck_sql="""
    SELECT CAST(CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS clamp_feb,
           CAST(CAST(DATE '2024-01-31' + INTERVAL 1 MONTH + INTERVAL 1 MONTH AS DATE) AS VARCHAR)
                                                                 AS two_steps,
           CAST(CAST(DATE '2024-01-31' + INTERVAL 2 MONTH AS DATE) AS VARCHAR) AS one_jump,
           CAST(CAST(DATE '2024-02-29' + INTERVAL 1 YEAR AS DATE) AS VARCHAR)  AS leap_year,
           CAST(CAST(DATE '2024-03-31' - INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS clamp_back,
           CAST(TIMESTAMP '2024-03-10 01:30:00' + INTERVAL 90 MINUTE AS VARCHAR)
                                                                 AS ts_plus_min,
           CAST(TIMESTAMP '2024-01-31 12:00:00' + INTERVAL 1 MONTH AS VARCHAR)
                                                                 AS ts_clamp,
           CAST(TRY_CAST('not a ts' AS TIMESTAMP) AS VARCHAR)    AS bad_parse,
           CAST(DATE '2024-03-01' - DATE '2024-02-01' AS INT)    AS leap_feb_days,
           CAST(DATE '2023-12-31' + 1 AS VARCHAR)                AS year_rollover
    """,
    tags=("functions", "edge", "interval"),
    doc="""Calendar-interval clamping corners (reference timestamps.slt /
    datetime/): month-end arithmetic clamps (Jan 31 + 1 month = Feb 29), so
    +1+1 month != +2 months (non-associativity pinned: 03-29 vs 03-31),
    leap-day + 1 year clamps to Feb 28, subtraction clamps symmetrically,
    and unparseable timestamps are NULL under TRY on both engines.""",
)

_sql_query(
    "fn_edge_unicode_fold",
    spark_sql="""
    SELECT upper('çödé')        AS upper_accented,
           lower('ЩУКА')        AS lower_cyrillic,
           upper('щука')        AS upper_cyrillic,
           lower('ΣΟΦΟ')        AS lower_greek,
           upper('σοφος')       AS upper_greek,
           upper('ǳ')           AS upper_titlecase_char,
           lower('Ａｂｃ')      AS lower_fullwidth,
           initcap('hello wORLD') AS initcap_basic,
           length('👩‍👩‍👧‍👦')   AS zwj_family_len,
           length('é')         AS combining_len,
           reverse('abc👍')     AS reverse_emoji,
           ascii('€')           AS euro_codepoint
    """,
    duck_sql="""
    SELECT upper('çödé')        AS upper_accented,
           lower('ЩУКА')        AS lower_cyrillic,
           upper('щука')        AS upper_cyrillic,
           lower('ΣΟΦΟ')        AS lower_greek,
           upper('σοφος')       AS upper_greek,
           upper('ǳ')           AS upper_titlecase_char,
           lower('Ａｂｃ')      AS lower_fullwidth,
           CASE WHEN TRUE THEN 'Hello World' END AS initcap_basic,
           CAST(length('👩‍👩‍👧‍👦') AS INT) AS zwj_family_len,
           CAST(length('é') AS INT) AS combining_len,
           reverse('abc👍')     AS reverse_emoji,
           CAST(ascii('€') AS INT) AS euro_codepoint
    """,
    tags=("functions", "edge", "unicode"),
    doc="""Unicode case folding + codepoint semantics (reference
    string/lower.slt, string/upper.slt, scalar.slt char-length cases):
    accented Latin, Cyrillic, Greek (non-final forms), the Unicode
    titlecase character ǳ, fullwidth forms, ZWJ emoji sequences counting 7
    codepoints, combining marks counting separately, and codepoint-true
    reverse/ascii.  Deliberately excluded (JVM vs ICU divergence, see
    module docstring): ß, dotted İ, final sigma, ligature expansion,
    chr() beyond ASCII.  DuckDB initcap('hello wORLD') agrees with Spark
    ('Hello World'); the oracle spells it as the literal to also pin the
    expected value itself.""",
)

_sql_query(
    "fn_edge_string_null_corners",
    spark_sql="""
    SELECT concat('a', NULL, 'b')          AS concat_null,
           'a' || NULL                     AS concat_op_null,
           concat_ws('-', 'a', NULL, 'b')  AS concat_ws_skip,
           substr('hello', -3)             AS substr_neg,
           substr('hello', 0)              AS substr_zero,
           repeat('ab', 0)                 AS repeat_zero,
           repeat('ab', -1)                AS repeat_neg,
           lpad('abc', 2, 'x')             AS lpad_truncate,
           split_part('a,b,c', ',', -1)    AS split_part_neg,
           nullif('x', 'x')                AS nullif_same,
           coalesce(NULL, NULL, 'z')       AS coalesce_last,
           trim(BOTH 'x' FROM 'xxaxx')     AS trim_chars
    """,
    duck_sql="""
    SELECT 'a' || NULL || 'b'              AS concat_null,
           'a' || NULL                     AS concat_op_null,
           concat_ws('-', 'a', NULL, 'b')  AS concat_ws_skip,
           substr('hello', -3)             AS substr_neg,
           substr('hello', 0)              AS substr_zero,
           repeat('ab', 0)                 AS repeat_zero,
           repeat('ab', -1)                AS repeat_neg,
           lpad('abc', 2, 'x')             AS lpad_truncate,
           split_part('a,b,c', ',', -1)    AS split_part_neg,
           nullif('x', 'x')                AS nullif_same,
           coalesce(NULL, NULL, 'z')       AS coalesce_last,
           trim('xxaxx', 'x')              AS trim_chars
    """,
    tags=("functions", "edge", "string"),
    doc="""NULL propagation + index corners in string functions (reference
    string/concat.slt, string/substr.slt, scalar.slt): Spark concat is
    NULL-propagating (oracle mirrors with the || chain — DuckDB's concat()
    skips NULLs instead), concat_ws skips NULLs on both, negative substr
    counts from the end, 0-start is the whole string, repeat clamps
    nonpositive counts to '', lpad truncates when the target is shorter,
    and split_part takes negative indexes from the end.""",
)
