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
           abs(CAST('-0.0' AS DOUBLE)) + CAST(0.0 AS DOUBLE)   AS abs_neg_zero,
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
           abs(CAST('-0.0' AS DOUBLE)) + CAST(0.0 AS DOUBLE)   AS abs_neg_zero,
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
    sign(-0.0) and abs(-0.0) are normalized by +0.0 (Spark abs strips the
    sign bit where DuckDB's `x < 0 ? -x : x` abs preserves it; the value
    hash is bit-sensitive).""",
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

_sql_query(
    "fn_edge_in_list_null",
    spark_sql="""
    SELECT CAST(1 IN (2, NULL) AS STRING)         AS in_miss_null,
           CAST(1 NOT IN (2, NULL) AS STRING)     AS not_in_miss_null,
           2 IN (2, NULL)                         AS in_hit_null,
           CAST(NULL IN (1, 2) AS STRING)         AS null_in_list,
           CAST(NULL NOT IN (1, 2) AS STRING)     AS null_not_in_list,
           2 NOT IN (3, 4)                        AS not_in_clean,
           1 IN (1.0, 2.5)                        AS in_mixed_numeric,
           '2' IN (1, 2, 3)                       AS in_string_coerced,
           CAST(CAST(NULL AS INT) IN (CAST(NULL AS INT)) AS STRING) AS null_in_null
    """,
    duck_sql="""
    SELECT CAST(1 IN (2, NULL) AS VARCHAR)        AS in_miss_null,
           CAST(1 NOT IN (2, NULL) AS VARCHAR)    AS not_in_miss_null,
           2 IN (2, NULL)                         AS in_hit_null,
           CAST(NULL IN (1, 2) AS VARCHAR)        AS null_in_list,
           CAST(NULL NOT IN (1, 2) AS VARCHAR)    AS null_not_in_list,
           2 NOT IN (3, 4)                        AS not_in_clean,
           1 IN (1.0, 2.5)                        AS in_mixed_numeric,
           '2' IN (1, 2, 3)                       AS in_string_coerced,
           CAST(CAST(NULL AS INT) IN (CAST(NULL AS INT)) AS VARCHAR) AS null_in_null
    """,
    tags=("functions", "edge", "predicates"),
    doc="""Three-valued IN-list logic (reference in_list.slt): a NULL in
    the list turns a miss into NULL (and NOT IN into NULL — the classic
    NOT-IN trap), a hit stays TRUE, a NULL probe is always NULL, and
    mixed numeric / string-vs-int lists coerce before comparing.  Both
    engines agree on every case (probed, not assumed).""",
)

_sql_query(
    "fn_edge_type_unification",
    spark_sql="""
    SELECT CAST(CASE WHEN 1 = 1 THEN 1 ELSE 2.5 END AS STRING)    AS case_int_dec,
           CAST(coalesce(CAST(NULL AS INT), 2.5) AS STRING)       AS coalesce_int_dec,
           CAST(CAST(1.23 AS DECIMAL(5,2)) * CAST(4.5 AS DECIMAL(3,1)) AS STRING)
                                                                  AS dec_mul_scale,
           CAST(CAST(1.23 AS DECIMAL(5,2)) + CAST(4.555 AS DECIMAL(6,3)) AS STRING)
                                                                  AS dec_add_scale,
           '42' = 42                                              AS str_int_eq,
           ' 42' = 42                                             AS str_int_ws_eq,
           '42.5' = 42.5                                          AS str_dec_eq,
           'v' || 7                                               AS concat_int,
           CAST(true AS STRING)                                   AS bool_render,
           CAST(greatest(1, 2.5) AS STRING)                       AS greatest_mixed
    """,
    duck_sql="""
    SELECT CAST(CASE WHEN 1 = 1 THEN 1 ELSE 2.5 END AS VARCHAR)   AS case_int_dec,
           CAST(coalesce(CAST(NULL AS INT), 2.5) AS VARCHAR)      AS coalesce_int_dec,
           CAST(CAST(1.23 AS DECIMAL(5,2)) * CAST(4.5 AS DECIMAL(3,1)) AS VARCHAR)
                                                                  AS dec_mul_scale,
           CAST(CAST(1.23 AS DECIMAL(5,2)) + CAST(4.555 AS DECIMAL(6,3)) AS VARCHAR)
                                                                  AS dec_add_scale,
           '42' = 42                                              AS str_int_eq,
           ' 42' = 42                                             AS str_int_ws_eq,
           '42.5' = 42.5                                          AS str_dec_eq,
           'v' || 7                                               AS concat_int,
           CAST(true AS VARCHAR)                                  AS bool_render,
           CAST(greatest(1, 2.5) AS VARCHAR)                      AS greatest_mixed
    """,
    tags=("functions", "edge", "coercion"),
    doc="""Type-unification corners (reference type_coercion.slt,
    string_numeric_coercion.slt, decimal.slt, case.slt): CASE/COALESCE
    over INT+DECIMAL unify to DECIMAL (rendered to pin the scale),
    decimal × and + follow the scale-addition / max-scale rules
    identically in both engines, string-vs-number comparison coerces the
    string (including leading whitespace), || stringifies numbers, and
    greatest() unifies mixed numeric args.""",
)

_sql_query(
    "fn_edge_div_mod_like",
    spark_sql="""
    SELECT -7 % 3                              AS neg_mod,
           7 % -3                              AS mod_neg,
           -7 div 2                            AS int_div_trunc,
           7 div -2                            AS int_div_trunc_neg,
           CAST(-7 AS BIGINT) / 2              AS true_div,
           7 % NULLIF(0, 0)                    AS mod_zero_null,
           'a_b' LIKE 'a#_b' ESCAPE '#'        AS like_escaped_us,
           '50%' LIKE '50#%' ESCAPE '#'        AS like_escaped_pct,
           'axb' LIKE 'a_b'                    AS like_wild_us,
           'ab' LIKE 'a%b'                     AS like_empty_pct,
           'AxB' LIKE 'a%'                     AS like_case_sensitive,
           'AxB' ILIKE 'a%'                    AS ilike_case_folds
    """,
    duck_sql="""
    SELECT -7 % 3                              AS neg_mod,
           7 % -3                              AS mod_neg,
           CAST(-7 // 2 AS BIGINT)             AS int_div_trunc,
           CAST(7 // -2 AS BIGINT)             AS int_div_trunc_neg,
           CAST(-7 AS BIGINT) / 2              AS true_div,
           7 % NULLIF(0, 0)                    AS mod_zero_null,
           'a_b' LIKE 'a#_b' ESCAPE '#'        AS like_escaped_us,
           '50%' LIKE '50#%' ESCAPE '#'        AS like_escaped_pct,
           'axb' LIKE 'a_b'                    AS like_wild_us,
           'ab' LIKE 'a%b'                     AS like_empty_pct,
           'AxB' LIKE 'a%'                     AS like_case_sensitive,
           'AxB' ILIKE 'a%'                    AS ilike_case_folds
    """,
    tags=("functions", "edge", "arithmetic", "predicates"),
    doc="""Division/modulo sign and LIKE-escape corners (reference
    operators.md, predicates.slt): % takes the dividend's sign in both
    engines, integer division truncates toward zero (Spark `div` ⇔ DuckDB
    `//`), / on integers is true division (DOUBLE) in both, %-by-zero is
    NULL-guarded via NULLIF (DuckDB raises where Spark ANSI-off returns
    NULL — the guard pins the portable form), and custom ESCAPE characters
    make _ and % literal identically.""",
)

_sql_query(
    "fn_edge_struct_map",
    spark_sql="""
    SELECT CAST((named_struct('a', 1, 'b', 'x')).a AS BIGINT)          AS field_access,
           named_struct('a', 1) = named_struct('a', 1)                 AS struct_eq,
           named_struct('a', 1, 'b', 2) < named_struct('a', 1, 'b', 3) AS struct_lt,
           CAST(element_at(map_from_arrays(array('k'), array(7)), 'k')
                AS STRING)                                             AS map_hit,
           CAST(element_at(map_from_arrays(array('k'), array(CAST(NULL AS INT))),
                'k') AS STRING)                                        AS map_null_val,
           array_join(map_keys(map_from_arrays(array('b', 'a'),
                array(1, 2))), ',')                                    AS map_key_order,
           CAST(cardinality(map_from_arrays(array('x', 'y'),
                array(1, 2))) AS BIGINT)                               AS map_size,
           (named_struct('a', CAST(NULL AS INT))).a IS NULL            AS null_field
    """,
    duck_sql="""
    SELECT CAST((struct_pack(a := 1, b := 'x')).a AS BIGINT)           AS field_access,
           struct_pack(a := 1) = struct_pack(a := 1)                   AS struct_eq,
           struct_pack(a := 1, b := 2) < struct_pack(a := 1, b := 3)   AS struct_lt,
           CAST(element_at(map(['k'], [7]), 'k')[1] AS VARCHAR)        AS map_hit,
           CAST(element_at(map(['k'], [CAST(NULL AS INT)]), 'k')[1]
                AS VARCHAR)                                            AS map_null_val,
           array_to_string(map_keys(map(['b', 'a'], [1, 2])), ',')     AS map_key_order,
           CAST(cardinality(map(['x', 'y'], [1, 2])) AS BIGINT)        AS map_size,
           (struct_pack(a := CAST(NULL AS INT))).a IS NULL             AS null_field
    """,
    tags=("functions", "edge", "nested"),
    doc="""Struct/map point semantics (reference struct.slt,
    dictionary_struct.slt, map.slt in sqllogictest): field access through a
    literal struct, struct equality and LEXICOGRAPHIC struct ordering
    (field order decides), map insertion-order preservation (keys 'b','a'
    stay 'b,a' in both engines — neither sorts), NULL-valued key lookup vs
    missing key (the missing-key case is EXCLUDED: Spark returns NULL where
    DuckDB returns an empty list — an engine-identity divergence documented
    here), and NULL struct fields.  DuckDB's map extraction returns a
    single-element list — the oracle indexes [1] to match Spark's scalar.""",
)

_sql_query(
    "fn_edge_numeric_timestamp_cast",
    spark_sql="""
    SELECT CAST(CAST(1700000000 AS BIGINT) AS TIMESTAMP)        AS int_to_ts,
           CAST(1700000000.25 AS TIMESTAMP)                     AS float_to_ts,
           CAST(TIMESTAMP '2023-11-14 22:13:20.25' AS DOUBLE)   AS ts_to_double,
           CAST(TIMESTAMP '2023-11-14 22:13:20.75' AS BIGINT)   AS ts_to_long,
           CAST(CAST(-1 AS BIGINT) AS TIMESTAMP)                AS pre_epoch,
           CAST(true AS INT)                                    AS bool_int,
           CAST(CAST(0.5 AS DOUBLE) AS TIMESTAMP)               AS half_second
    """,
    duck_sql="""
    SELECT make_timestamp(CAST(1700000000 AS BIGINT) * 1000000)  AS int_to_ts,
           make_timestamp(CAST(1700000000.25 * 1000000 AS BIGINT)) AS float_to_ts,
           epoch(TIMESTAMP '2023-11-14 22:13:20.25')             AS ts_to_double,
           CAST(floor(epoch(TIMESTAMP '2023-11-14 22:13:20.75')) AS BIGINT) AS ts_to_long,
           make_timestamp(-1000000)                              AS pre_epoch,
           CAST(true AS INT)                                     AS bool_int,
           make_timestamp(500000)                                AS half_second
    """,
    tags=("functions", "edge", "cast", "datetime"),
    doc="""Numeric ⇄ timestamp casts (reference test_files/spark/conversion/
    {cast_int_to_timestamp,cast_float_to_timestamp}.slt): Spark casts
    numerics as SECONDS since epoch, keeping the fraction (0.25 s →
    250 000 µs), flooring on the way back to integers (22:13:20.75 →
    ...00, not ...01), and handling pre-epoch negatives; DuckDB spells the
    same values via make_timestamp(micros)/epoch().  bool→int included
    from the same corpus.""",
)


_sql_query(
    "fn_edge_decimal_arith",
    spark_sql="""
    SELECT CAST(CAST(1.23 AS DECIMAL(10,4)) + CAST(2.77 AS DECIMAL(10,4)) AS DOUBLE) AS dec_add,
           CAST(CAST(1.25 AS DECIMAL(10,2)) * CAST(0.04 AS DECIMAL(10,2)) AS DOUBLE) AS dec_mul,
           CAST(ROUND(CAST(1 AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(10,2)), 10) AS DOUBLE) AS dec_div_10dp,
           CAST(CAST(1.2345 AS DECIMAL(24,2)) AS DOUBLE)                    AS dec_cast_trunc_scale,
           CAST(CAST(CAST(1.23 AS DECIMAL(10,3)) AS DECIMAL(10,4)) AS DOUBLE) AS dec_rescale_up,
           CAST((SELECT SUM(x) FROM VALUES (CAST(0.1 AS DECIMAL(3,1))),
                                           (CAST(0.2 AS DECIMAL(3,1))) t(x)) AS DOUBLE) AS dec_sum_exact,
           CAST((SELECT AVG(x) FROM VALUES (CAST(1 AS DECIMAL(5,2))),
                                           (CAST(2 AS DECIMAL(5,2))) t(x)) AS DOUBLE) AS dec_avg,
           CAST(CAST(0.00001 AS DECIMAL(10,6)) + CAST(0.0000001 AS DECIMAL(12,7)) AS DOUBLE) AS dec_mixed_scale_add
    """,
    duck_sql="""
    SELECT CAST(CAST(1.23 AS DECIMAL(10,4)) + CAST(2.77 AS DECIMAL(10,4)) AS DOUBLE) AS dec_add,
           CAST(CAST(1.25 AS DECIMAL(10,2)) * CAST(0.04 AS DECIMAL(10,2)) AS DOUBLE) AS dec_mul,
           CAST(ROUND(CAST(1 AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(10,2)), 10) AS DOUBLE) AS dec_div_10dp,
           CAST(CAST(1.2345 AS DECIMAL(24,2)) AS DOUBLE)                    AS dec_cast_trunc_scale,
           CAST(CAST(CAST(1.23 AS DECIMAL(10,3)) AS DECIMAL(10,4)) AS DOUBLE) AS dec_rescale_up,
           CAST((SELECT SUM(x) FROM (VALUES (CAST(0.1 AS DECIMAL(3,1))),
                                            (CAST(0.2 AS DECIMAL(3,1)))) t(x)) AS DOUBLE) AS dec_sum_exact,
           CAST((SELECT AVG(x) FROM (VALUES (CAST(1 AS DECIMAL(5,2))),
                                            (CAST(2 AS DECIMAL(5,2)))) t(x)) AS DOUBLE) AS dec_avg,
           CAST(CAST(0.00001 AS DECIMAL(10,6)) + CAST(0.0000001 AS DECIMAL(12,7)) AS DOUBLE) AS dec_mixed_scale_add
    """,
    tags=("functions", "edge", "decimal"),
    doc="""Decimal precision/scale propagation (reference sqllogictest
    decimal.slt: add/mul widen precision, mixed-scale add unifies to the
    wider scale, string->decimal(24,2) drops sub-scale digits, sum/avg of
    decimals stay exact).  Division is pinned at ROUND(..,10): Spark's
    quotient scale is 13 where DuckDB keeps more digits.  Excluded, known:
    CAST(-1.555 AS DECIMAL(10,2)) — Spark HALF_UPs away from zero (-1.56),
    DuckDB rounds to -1.55 (same family as the documented 9.95 case).""",
)


_sql_query(
    "agg_edge_empty_input",
    spark_sql="""
    SELECT (SELECT SUM(x)    FROM (SELECT 1 AS x WHERE FALSE) t) AS empty_sum,
           (SELECT COUNT(x)  FROM (SELECT 1 AS x WHERE FALSE) t) AS empty_count,
           (SELECT COUNT(*)  FROM (SELECT 1 AS x WHERE FALSE) t) AS empty_count_star,
           (SELECT MIN(x)    FROM (SELECT 1 AS x WHERE FALSE) t) AS empty_min,
           (SELECT AVG(x)    FROM (SELECT CAST(1 AS DOUBLE) AS x WHERE FALSE) t) AS empty_avg,
           (SELECT STDDEV_SAMP(x) FROM (SELECT CAST(1 AS DOUBLE) AS x WHERE FALSE) t) AS empty_stddev,
           (SELECT STDDEV_SAMP(x) FROM VALUES (5.0), (5.0) t(x))  AS stddev_const,
           (SELECT VAR_SAMP(x)    FROM VALUES (5.0) t(x))         AS var_single,
           (SELECT VAR_POP(x)     FROM VALUES (5.0) t(x))         AS var_pop_single,
           (SELECT COVAR_SAMP(x, y) FROM VALUES (1.0, 2.0) t(x, y)) AS covar_single,
           (SELECT COUNT(*) FROM VALUES (NULL) t(x))              AS count_star_null_row,
           (SELECT SUM(x) FILTER (WHERE x > 10) FROM VALUES (1), (2) t(x)) AS filtered_to_empty
    """,
    duck_sql="""
    SELECT (SELECT SUM(x)    FROM (SELECT 1 AS x WHERE FALSE) t) AS empty_sum,
           (SELECT COUNT(x)  FROM (SELECT 1 AS x WHERE FALSE) t) AS empty_count,
           (SELECT COUNT(*)  FROM (SELECT 1 AS x WHERE FALSE) t) AS empty_count_star,
           (SELECT MIN(x)    FROM (SELECT 1 AS x WHERE FALSE) t) AS empty_min,
           (SELECT AVG(x)    FROM (SELECT CAST(1 AS DOUBLE) AS x WHERE FALSE) t) AS empty_avg,
           (SELECT STDDEV_SAMP(x) FROM (SELECT CAST(1 AS DOUBLE) AS x WHERE FALSE) t) AS empty_stddev,
           (SELECT STDDEV_SAMP(x) FROM (VALUES (5.0), (5.0)) t(x)) AS stddev_const,
           (SELECT VAR_SAMP(x)    FROM (VALUES (5.0)) t(x))        AS var_single,
           (SELECT VAR_POP(x)     FROM (VALUES (5.0)) t(x))        AS var_pop_single,
           (SELECT COVAR_SAMP(x, y) FROM (VALUES (1.0, 2.0)) t(x, y)) AS covar_single,
           (SELECT COUNT(*) FROM (VALUES (NULL)) t(x))             AS count_star_null_row,
           (SELECT SUM(x) FILTER (WHERE x > 10) FROM (VALUES (1), (2)) t(x)) AS filtered_to_empty
    """,
    tags=("functions", "edge", "aggregate"),
    doc="""Empty-input / degenerate-input aggregates (reference
    sqllogictest aggregate.slt empty-relation blocks): SUM/MIN/AVG/STDDEV
    over zero rows -> NULL while COUNT -> 0 (including a FILTER that
    eliminates every row); single-row VAR_SAMP/COVAR_SAMP -> NULL but
    VAR_POP -> 0.0; STDDEV of a constant -> exactly 0.0; COUNT(*) counts
    all-NULL rows.  Excluded, known: SKEWNESS of n=2 (Spark 0.0, DuckDB
    NULL) and CORR of a zero-variance side (Spark errors, DuckDB NULL).""",
)


_sql_query(
    "agg_edge_null_groups",
    spark_sql="""
    SELECT COALESCE(k, '<null>') AS grp,
           COUNT(*)              AS c_star,
           COUNT(v)              AS c_v,
           SUM(v)                AS s_v,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS cd_v
    FROM VALUES (NULL, 1), (NULL, 2), (NULL, NULL),
                ('a', 3), ('a', NULL), ('b', NULL) t(k, v)
    GROUP BY k
    ORDER BY grp
    """,
    duck_sql="""
    SELECT COALESCE(k, '<null>') AS grp,
           COUNT(*)              AS c_star,
           COUNT(v)              AS c_v,
           CAST(SUM(v) AS BIGINT) AS s_v,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS cd_v
    FROM (VALUES (NULL, 1), (NULL, 2), (NULL, NULL),
                 ('a', 3), ('a', NULL), ('b', NULL)) t(k, v)
    GROUP BY k
    ORDER BY grp
    """,
    tags=("functions", "edge", "aggregate", "group-by"),
    doc="""NULL grouping-key semantics (reference sqllogictest
    group_by.slt NULL-group corners): NULL keys form ONE group in both
    engines; within it COUNT(*) counts rows, COUNT(v)/SUM(v)/COUNT(DISTINCT
    v) skip NULL values; an all-NULL-value group yields SUM NULL with
    COUNT(*) > 0.  DuckDB's SUM(int)->HUGEINT is pinned to BIGINT (Spark
    sums integers in long).""",
)


_sql_query(
    "agg_edge_overflow_moments",
    spark_sql="""
    SELECT (SELECT try_sum(v) FROM VALUES (CAST(9223372036854775807 AS BIGINT)),
                                          (CAST(1 AS BIGINT)) t(v))  AS sum_bigint_overflow,
           (SELECT AVG(v) FROM VALUES (CAST(9223372036854775807 AS BIGINT)),
                                      (CAST(9223372036854775807 AS BIGINT)) t(v)) AS avg_at_int64_max,
           (SELECT SUM(DISTINCT v) FROM VALUES (1), (1), (2) t(v))   AS sum_distinct,
           (SELECT MEDIAN(v) FROM VALUES (1), (2), (3), (4) t(v))    AS median_even,
           (SELECT MODE(v) FROM VALUES (1), (1), (2), (2) t(v))      AS mode_lowest_tie,
           (SELECT BOOL_AND(b) FROM VALUES (true), (NULL) t(b))      AS bool_and_ignores_null,
           (SELECT BOOL_OR(b) FROM VALUES (false), (NULL) t(b))      AS bool_or_ignores_null,
           (SELECT MIN(s) FROM VALUES ('b'), ('A'), (NULL) t(s))     AS min_str_binary_order
    """,
    duck_sql="""
    SELECT (SELECT CASE WHEN s BETWEEN -9223372036854775808 AND 9223372036854775807
                        THEN CAST(s AS BIGINT) END
            FROM (SELECT SUM(v) AS s FROM (VALUES (CAST(9223372036854775807 AS BIGINT)),
                                                  (CAST(1 AS BIGINT))) t(v))) AS sum_bigint_overflow,
           (SELECT AVG(v) FROM (VALUES (CAST(9223372036854775807 AS BIGINT)),
                                       (CAST(9223372036854775807 AS BIGINT))) t(v)) AS avg_at_int64_max,
           (SELECT CAST(SUM(DISTINCT v) AS BIGINT) FROM (VALUES (1), (1), (2)) t(v)) AS sum_distinct,
           (SELECT MEDIAN(v) FROM (VALUES (1), (2), (3), (4)) t(v))   AS median_even,
           (SELECT CAST(MODE(v) AS INTEGER) FROM (VALUES (1), (1), (2), (2)) t(v)) AS mode_lowest_tie,
           (SELECT BOOL_AND(b) FROM (VALUES (true), (NULL)) t(b))     AS bool_and_ignores_null,
           (SELECT BOOL_OR(b) FROM (VALUES (false), (NULL)) t(b))     AS bool_or_ignores_null,
           (SELECT MIN(s) FROM (VALUES ('b'), ('A'), (NULL)) t(s))    AS min_str_binary_order
    """,
    tags=("functions", "edge", "aggregate", "overflow"),
    doc="""Overflow and order-sensitive aggregate corners (reference
    sqllogictest aggregate.slt overflow rows + duplicate/tie blocks):
    int64 SUM overflow -> NULL under try semantics (DuckDB's HUGEINT sum
    range-guarded to mirror it), AVG at int64 max computes in double
    without overflow, SUM(DISTINCT) dedups first, even-count MEDIAN
    interpolates to .5, MODE breaks ties to the lowest value in both
    engines, BOOL_AND/BOOL_OR skip NULLs, and string MIN uses binary
    (case-sensitive) order ('A' < 'b').""",
)


_sql_query(
    "fn_edge_case_coalesce",
    spark_sql="""
    SELECT CASE WHEN CAST(NULL AS BOOLEAN) THEN 'y' ELSE 'n' END  AS case_null_cond,
           CASE WHEN 1 = 2 THEN 'y' END                           AS case_no_else,
           CASE CAST(NULL AS INT) WHEN 1 THEN 'one' ELSE 'other' END AS case_null_subject,
           CAST(CASE WHEN true THEN 1 ELSE 2.5 END AS DOUBLE)     AS case_type_unify,
           NULLIF(3, 3)                                           AS nullif_same,
           NULLIF(3, 4)                                           AS nullif_diff,
           CAST(COALESCE(NULL, 1, 2.5) AS DOUBLE)                 AS coalesce_type_unify,
           CAST(GREATEST(1, NULL, 3) AS BIGINT)                   AS greatest_skips_null,
           LEAST(CAST(NULL AS INT), CAST(NULL AS INT))            AS least_all_null,
           CAST(NULL AS INT) IS DISTINCT FROM NULL                AS null_not_distinct_null,
           1 IS NOT DISTINCT FROM NULL                            AS one_distinct_null
    """,
    duck_sql="""
    SELECT CASE WHEN CAST(NULL AS BOOLEAN) THEN 'y' ELSE 'n' END  AS case_null_cond,
           CASE WHEN 1 = 2 THEN 'y' END                           AS case_no_else,
           CASE CAST(NULL AS INT) WHEN 1 THEN 'one' ELSE 'other' END AS case_null_subject,
           CAST(CASE WHEN true THEN 1 ELSE 2.5 END AS DOUBLE)     AS case_type_unify,
           NULLIF(3, 3)                                           AS nullif_same,
           NULLIF(3, 4)                                           AS nullif_diff,
           CAST(COALESCE(NULL, 1, 2.5) AS DOUBLE)                 AS coalesce_type_unify,
           CAST(GREATEST(1, NULL, 3) AS BIGINT)                   AS greatest_skips_null,
           LEAST(CAST(NULL AS INT), CAST(NULL AS INT))            AS least_all_null,
           CAST(NULL AS INT) IS DISTINCT FROM NULL                AS null_not_distinct_null,
           1 IS NOT DISTINCT FROM NULL                            AS one_distinct_null
    """,
    tags=("functions", "edge", "conditional"),
    doc="""Conditional-expression corners (reference sqllogictest case.slt /
    coalesce.slt): a NULL condition selects the ELSE branch, a CASE with no
    ELSE yields NULL, a NULL simple-CASE subject never matches, branch
    types unify numerically (int+decimal -> decimal), NULLIF(x,x) is NULL,
    GREATEST/LEAST skip NULLs (all-NULL -> NULL), and the IS [NOT] DISTINCT
    FROM null-safe comparator treats NULL as a comparable value.""",
)


_sql_query(
    "fn_edge_like_patterns",
    spark_sql="""
    SELECT 'abc' LIKE 'a_c'                          AS underscore_one_char,
           'abcde' LIKE '_b%e'                       AS mixed_wildcards,
           '' LIKE '%'                               AS empty_matches_pct,
           '' LIKE '_'                               AS empty_not_one,
           'a.c[1]' LIKE 'a.c[1]'                    AS regex_chars_literal,
           '50%' LIKE '50!%' ESCAPE '!'              AS escaped_percent,
           'a_c' LIKE 'a!_c' ESCAPE '!'              AS escaped_underscore,
           'ABC' ILIKE 'abc'                         AS ilike_case_fold,
           'Hello World' ILIKE 'hello%'              AS ilike_prefix,
           NULL NOT LIKE 'x'                         AS null_not_like,
           'abc123' RLIKE '[a-z]+[0-9]+'             AS regex_match
    """,
    duck_sql="""
    SELECT 'abc' LIKE 'a_c'                          AS underscore_one_char,
           'abcde' LIKE '_b%e'                       AS mixed_wildcards,
           '' LIKE '%'                               AS empty_matches_pct,
           '' LIKE '_'                               AS empty_not_one,
           'a.c[1]' LIKE 'a.c[1]'                    AS regex_chars_literal,
           '50%' LIKE '50!%' ESCAPE '!'              AS escaped_percent,
           'a_c' LIKE 'a!_c' ESCAPE '!'              AS escaped_underscore,
           'ABC' ILIKE 'abc'                         AS ilike_case_fold,
           'Hello World' ILIKE 'hello%'              AS ilike_prefix,
           NULL NOT LIKE 'x'                         AS null_not_like,
           regexp_matches('abc123', '[a-z]+[0-9]+')  AS regex_match
    """,
    tags=("functions", "edge", "string", "pattern"),
    doc="""LIKE/ILIKE pattern corners (reference sqllogictest
    string/like.slt + predicates.slt): _ is exactly one char (so '' LIKE
    '_' is false while '' LIKE '%' is true), regex metacharacters are
    literal in LIKE, explicit ESCAPE neutralizes % and _, ILIKE
    case-folds, NULL subjects propagate NULL through NOT LIKE, and RLIKE
    is true regex.  Excluded, known: Spark treats backslash as a default
    escape character; DuckDB only escapes via an explicit ESCAPE clause.""",
)


_sql_query(
    "fn_edge_array_struct_corners",
    spark_sql="""
    SELECT element_at(array(1,2,3), -1)                          AS arr_neg_index,
           try_element_at(array(1,2,3), 9)                       AS arr_oob_null,
           array_join(slice(array(1,2,3,4), 2, 2), ',')          AS arr_slice,
           array_position(array(10,20,30), 20)                   AS arr_position_1based,
           array_join(transform(array_sort(array(3,NULL,1)),
             x -> coalesce(cast(x as string),'N')), ',')         AS arr_sort_nulls_last,
           array(1,2) = array(1,2)                               AS arr_eq,
           struct(1, 'a') = struct(1, 'a')                       AS struct_eq,
           struct(1, 'b') < struct(1, 'c')                       AS struct_lexicographic,
           array_join(flatten(array(array(1,2), array(3))), ',') AS arr_flatten,
           array_join(array_sort(array_distinct(array(2,1,2,NULL))), ',') AS arr_distinct,
           array_join(array_sort(array_union(array(1,2), array(2,3))), ',') AS arr_union,
           aggregate(zip_with(array(1,2), array(10,20), (x,y) -> x+y),
                     0, (a,v) -> a+v)                            AS arr_zip_fold
    """,
    duck_sql="""
    SELECT list_extract([1,2,3], -1)                             AS arr_neg_index,
           list_extract([1,2,3], 9)                              AS arr_oob_null,
           array_to_string([1,2,3,4][2:3], ',')                  AS arr_slice,
           CAST(list_position([10,20,30], 20) AS BIGINT)         AS arr_position_1based,
           array_to_string(list_transform(list_sort([3,NULL,1], 'ASC', 'NULLS LAST'),
             x -> coalesce(cast(x as varchar),'N')), ',')        AS arr_sort_nulls_last,
           [1,2] = [1,2]                                         AS arr_eq,
           ROW(1, 'a') = ROW(1, 'a')                             AS struct_eq,
           ROW(1, 'b') < ROW(1, 'c')                             AS struct_lexicographic,
           array_to_string(flatten([[1,2],[3]]), ',')            AS arr_flatten,
           array_to_string(list_sort(list_distinct([2,1,2,NULL]), 'ASC', 'NULLS LAST'), ',') AS arr_distinct,
           array_to_string(list_sort(list_distinct(list_concat([1,2],[2,3]))), ',') AS arr_union,
           list_reduce(list_transform(list_zip([1,2],[10,20]), p -> p[1]+p[2]),
                       (a,v) -> a+v)                             AS arr_zip_fold
    """,
    tags=("functions", "edge", "nested"),
    doc="""Array/struct point corners (reference sqllogictest array/ dir +
    struct.slt): -1 indexes from the end, out-of-bounds is NULL under try
    semantics, slice/position are 1-based, sort puts NULLs last ascending,
    arrays and structs compare element-wise (structs lexicographically),
    flatten/distinct/union normalize, and zip_with+fold is the dot-product
    shape.  Excluded, known: array_contains over an array containing NULL
    (Spark three-valued NULL, DuckDB false).""",
)


_sql_query(
    "window_edge_frames_nulls",
    spark_sql="""
    SELECT i,
           CAST(SUM(v) OVER () AS DOUBLE)                          AS sum_whole_partition,
           CAST(SUM(v) OVER (ORDER BY i) AS DOUBLE)                AS running_default_frame,
           CAST(FIRST_VALUE(v) IGNORE NULLS OVER (ORDER BY i DESC) AS DOUBLE) AS first_ignore_nulls_desc,
           CAST(LEAD(v, 1, -1.0) OVER (ORDER BY i) AS DOUBLE)      AS lead_with_default,
           CAST(NTH_VALUE(v, 2) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS DOUBLE) AS nth2_full_frame,
           CAST(NTILE(3) OVER (ORDER BY i) AS BIGINT)              AS ntile_uneven
    FROM VALUES (1, 10.0), (2, 20.0), (3, NULL), (4, 40.0), (5, 50.0) t(i, v)
    ORDER BY i
    """,
    duck_sql="""
    SELECT i,
           CAST(SUM(v) OVER () AS DOUBLE)                          AS sum_whole_partition,
           CAST(SUM(v) OVER (ORDER BY i) AS DOUBLE)                AS running_default_frame,
           CAST(FIRST_VALUE(v IGNORE NULLS) OVER (ORDER BY i DESC) AS DOUBLE) AS first_ignore_nulls_desc,
           CAST(LEAD(v, 1, -1.0) OVER (ORDER BY i) AS DOUBLE)      AS lead_with_default,
           CAST(NTH_VALUE(v, 2) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS DOUBLE) AS nth2_full_frame,
           CAST(NTILE(3) OVER (ORDER BY i) AS BIGINT)              AS ntile_uneven
    FROM (VALUES (1, 10.0), (2, 20.0), (3, NULL), (4, 40.0), (5, 50.0)) t(i, v)
    ORDER BY i
    """,
    tags=("functions", "edge", "window"),
    doc="""Window default-frame and NULL-handling corners (reference
    sqllogictest window.slt): no-ORDER-BY means whole-partition frame; an
    ORDER BY without a frame clause defaults to RANGE UNBOUNDED PRECEDING
    .. CURRENT ROW (NULL rows still emit the running value of their peer
    group); FIRST_VALUE IGNORE NULLS skips leading NULLs; LEAD's third
    argument fills past the partition edge; NTH_VALUE needs the full frame
    to see forward; NTILE distributes remainder rows to the first tiles.""",
)


_sql_query(
    "fn_edge_union_range_limit",
    spark_sql="""
    SELECT (SELECT CAST(SUM(x) AS DOUBLE) FROM
              (SELECT CAST(1 AS DOUBLE) AS x UNION ALL SELECT 2.5) u)     AS union_int_double_unify,
           (SELECT COUNT(*) FROM
              (SELECT 1 AS x UNION SELECT 1 UNION ALL SELECT 1) u)        AS union_distinct_then_all,
           (SELECT COUNT(*) FROM (SELECT 1 AS x UNION ALL SELECT 2) u
             LIMIT 5 OFFSET 0)                                            AS limit_beyond_rows,
           (SELECT MAX(s) FROM (
              SELECT CAST(SUM(v) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS s
              FROM VALUES (1), (1), (2) t(v)) r)                          AS range_frame_peer_rows
    """,
    duck_sql="""
    SELECT (SELECT CAST(SUM(x) AS DOUBLE) FROM
              (SELECT CAST(1 AS DOUBLE) AS x UNION ALL SELECT 2.5) u)     AS union_int_double_unify,
           (SELECT COUNT(*) FROM
              (SELECT 1 AS x UNION SELECT 1 UNION ALL SELECT 1) u)        AS union_distinct_then_all,
           (SELECT COUNT(*) FROM (SELECT 1 AS x UNION ALL SELECT 2) u
             LIMIT 5 OFFSET 0)                                            AS limit_beyond_rows,
           (SELECT MAX(s) FROM (
              SELECT CAST(SUM(v) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS s
              FROM (VALUES (1), (1), (2)) t(v)) r)                        AS range_frame_peer_rows
    """,
    tags=("functions", "edge", "setop", "window"),
    doc="""Set-operation typing and RANGE-frame peer semantics (reference
    sqllogictest union.slt / window.slt): UNION unifies int with double,
    UNION (distinct) composes with a following UNION ALL left-to-right,
    LIMIT beyond the row count returns what exists, and a RANGE frame
    includes the whole peer group (duplicate ORDER BY values sum
    together).  Excluded, known: int UNION varchar — DuckDB coerces to
    varchar, Spark tries int and fails the cast.""",
)


_sql_query(
    "fn_edge_explode_map_dates",
    spark_sql="""
    SELECT (SELECT COUNT(*) FROM (SELECT explode(array()) AS x) t)            AS explode_empty_rows,
           (SELECT COUNT(*) FROM (SELECT explode(CAST(NULL AS ARRAY<INT>)) AS x) t) AS explode_null_rows,
           (SELECT COUNT(*) FROM (SELECT explode_outer(CAST(NULL AS ARRAY<INT>)) AS x) t) AS explode_outer_keeps_row,
           (SELECT CAST(MIN(p) AS BIGINT) FROM (SELECT posexplode(array(7, 8)) AS (p, x)) t) AS posexplode_zero_based,
           try_element_at(map('a', 1), 'zz')                                  AS map_missing_key_null,
           array_join(array_sort(map_keys(map('b', 2, 'a', 1))), ',')        AS map_keys_all,
           size(map('a', 1, 'b', 2))                                         AS map_cardinality,
           CAST(date_trunc('week', TIMESTAMP '2024-03-14 10:00:00') AS TIMESTAMP) AS trunc_week_monday,
           months_between(DATE '2024-03-31', DATE '2024-02-29')              AS months_between_eom,
           CAST(add_months(DATE '2024-01-31', 1) AS TIMESTAMP)               AS add_months_clamps,
           CAST(last_day(DATE '2024-02-05') AS TIMESTAMP)                    AS last_day_leap,
           datediff(DATE '2024-03-01', DATE '2024-02-28')                    AS datediff_leap_span,
           weekofyear(DATE '2021-01-01')                                     AS iso_week_jan1,
           dayofweek(DATE '2024-03-17')                                      AS dow_sunday_is_1
    """,
    duck_sql="""
    SELECT (SELECT COUNT(*) FROM (SELECT unnest([]) AS x) t)                  AS explode_empty_rows,
           (SELECT COUNT(*) FROM (SELECT unnest(NULL::INT[]) AS x) t)         AS explode_null_rows,
           (SELECT COUNT(*) FROM (SELECT unnest(COALESCE(NULL::INT[], [NULL::INT])) AS x) t) AS explode_outer_keeps_row,
           (SELECT MIN(o - 1) FROM (SELECT generate_subscripts([7, 8], 1) AS o) t) AS posexplode_zero_based,
           list_extract(map_extract(MAP(['a'], [1]), 'zz'), 1)                AS map_missing_key_null,
           array_to_string(list_sort(map_keys(MAP(['b', 'a'], [2, 1]))), ',') AS map_keys_all,
           CAST(cardinality(MAP(['a', 'b'], [1, 2])) AS INTEGER)              AS map_cardinality,
           date_trunc('week', TIMESTAMP '2024-03-14 10:00:00')               AS trunc_week_monday,
           CAST(1.0 AS DOUBLE)                                                AS months_between_eom,
           CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS TIMESTAMP)           AS add_months_clamps,
           CAST(last_day(DATE '2024-02-05') AS TIMESTAMP)                     AS last_day_leap,
           CAST(datediff('day', DATE '2024-02-28', DATE '2024-03-01') AS INTEGER) AS datediff_leap_span,
           CAST(weekofyear(DATE '2021-01-01') AS INTEGER)                     AS iso_week_jan1,
           CAST(dayofweek(DATE '2024-03-17') + 1 AS INTEGER)                  AS dow_sunday_is_1
    """,
    tags=("functions", "edge", "nested", "datetime"),
    doc="""Generator, map-access and calendar corners (reference
    sqllogictest unnest.slt, map.slt, datetime/ dir): exploding an empty or
    NULL array yields zero rows while explode_outer keeps one NULL row
    (DuckDB spelled via COALESCE to a one-NULL list), posexplode positions
    are 0-based (generate_subscripts is 1-based, offset in the oracle),
    missing map keys are NULL under try access, month arithmetic clamps to
    end-of-month (Jan 31 + 1 month = Feb 29 on a leap year;
    months_between of two EOMs is exactly 1.0 — DuckDB has no
    months_between, pinned), ISO week of 2021-01-01 is 53, and Spark's
    dayofweek is 1-based Sunday (DuckDB 0-based, offset).""",
)


_sql_query(
    "fn_edge_string_slicing",
    spark_sql="""
    SELECT array_join(split('a,b,,', ','), '|')        AS split_keeps_trailing_empties,
           array_join(split('a,b,c', ',', 2), '|')     AS split_with_limit,
           trim(BOTH 'xy' FROM 'xyhixy')               AS trim_charset,
           lpad('hello', 3, '*')                       AS lpad_truncates,
           translate('hello', 'el', 'i')               AS translate_deletes_unmatched,
           overlay('hello' PLACING 'XX' FROM 2)        AS overlay_replaces,
           initcap('heLLo wORld')                      AS initcap_lowers_rest,
           repeat('ab', 0)                             AS repeat_zero_empty,
           reverse('añb')                              AS reverse_is_codepoint_safe,
           substr('hello', -3)                         AS substr_negative_from_end,
           CAST(instr('hello', 'zz') AS BIGINT)        AS instr_missing_zero,
           concat_ws('-', 'a', NULL, 'b')              AS concat_ws_skips_nulls
    """,
    duck_sql="""
    SELECT array_to_string(string_split('a,b,,', ','), '|')  AS split_keeps_trailing_empties,
           array_to_string(['a', 'b,c'], '|')                AS split_with_limit,
           trim('xyhixy', 'xy')                              AS trim_charset,
           lpad('hello', 3, '*')                             AS lpad_truncates,
           translate('hello', 'el', 'i')                     AS translate_deletes_unmatched,
           concat(substr('hello', 1, 1), 'XX', substr('hello', 4)) AS overlay_replaces,
           array_to_string(list_transform(string_split('heLLo wORld', ' '),
             w -> upper(w[1]) || lower(w[2:])), ' ')         AS initcap_lowers_rest,
           repeat('ab', 0)                                   AS repeat_zero_empty,
           reverse('añb')                                    AS reverse_is_codepoint_safe,
           substr('hello', -3)                               AS substr_negative_from_end,
           strpos('hello', 'zz')                             AS instr_missing_zero,
           concat_ws('-', 'a', NULL, 'b')                    AS concat_ws_skips_nulls
    """,
    tags=("functions", "edge", "string"),
    doc="""String slicing/padding corners (reference sqllogictest string/
    dir): split keeps trailing empty fields, Spark's 3-arg split limit has
    no DuckDB spelling (tail pinned), charset trim, lpad TRUNCATES when
    the input exceeds the target, translate deletes chars with no
    replacement, overlay/initcap spelled via concat-substr and a
    word-transform in the oracle, repeat x0 is '', reverse is
    codepoint-safe, negative substr counts from the end, instr misses as
    0, concat_ws skips NULLs.  Excluded, known: substr(s, 0, n) — Spark
    treats start 0 as 1 but still consumes a length slot differently than
    DuckDB; rpad with an empty pad — Spark no-ops, DuckDB errors.""",
)


_sql_query(
    "fn_edge_regex_datetime_parse",
    spark_sql=r"""
    SELECT regexp_replace('john smith', '(\\w+) (\\w+)', '$2 $1') AS re_backref_swap,
           regexp_extract('<a><b>', '<(.*)>', 1)                  AS re_greedy_spans,
           regexp_extract('<a><b>', '<(.*?)>', 1)                 AS re_lazy_minimal,
           'abc' RLIKE '^abc$'                                    AS re_anchors,
           regexp_extract('abc', '(\\d+)', 1)                     AS re_no_match_empty,
           regexp_replace('abc', 'x*', '-')                       AS re_empty_match_global,
           CAST(size(regexp_extract_all('a1b22c333', '\\d+', 0)) AS BIGINT) AS re_match_count,
           'ABC' RLIKE '(?i)abc'                                  AS re_inline_flag,
           CAST(to_date('14/03/2024', 'dd/MM/yyyy') AS TIMESTAMP) AS parse_date_fmt,
           try_to_timestamp('nope', 'yyyy-MM-dd')                 AS try_parse_bad_null,
           from_unixtime(1700000000, 'yyyy-MM-dd HH:mm:ss')       AS epoch_format_utc,
           CAST(to_timestamp('2024-03-14 10:20:30.5',
                'yyyy-MM-dd HH:mm:ss.S') AS STRING)               AS parse_fractional
    """,
    duck_sql=r"""
    SELECT regexp_replace('john smith', '(\w+) (\w+)', '\2 \1')   AS re_backref_swap,
           regexp_extract('<a><b>', '<(.*)>', 1)                  AS re_greedy_spans,
           regexp_extract('<a><b>', '<(.*?)>', 1)                 AS re_lazy_minimal,
           regexp_matches('abc', '^abc$')                         AS re_anchors,
           regexp_extract('abc', '(\d+)', 1)                      AS re_no_match_empty,
           regexp_replace('abc', 'x*', '-', 'g')                  AS re_empty_match_global,
           CAST(len(regexp_extract_all('a1b22c333', '\d+')) AS BIGINT) AS re_match_count,
           regexp_matches('ABC', '(?i)abc')                       AS re_inline_flag,
           strptime('14/03/2024', '%d/%m/%Y')                     AS parse_date_fmt,
           try_strptime('nope', '%Y-%m-%d')                       AS try_parse_bad_null,
           strftime(to_timestamp(1700000000), '%Y-%m-%d %H:%M:%S') AS epoch_format_utc,
           CAST(strptime('2024-03-14 10:20:30.500',
                '%Y-%m-%d %H:%M:%S.%g') AS VARCHAR)               AS parse_fractional
    """,
    tags=("functions", "edge", "regex", "datetime"),
    doc="""Regex engine and datetime-parse corners (reference sqllogictest
    regexp.slt + datetime/ formats): capture backreferences ($n vs \\n
    spelling), greedy vs lazy quantifiers agree between Java regex and
    RE2, no-match extract is '' not NULL, empty-pattern replacement is
    global in Spark (DuckDB pinned with the 'g' flag), inline (?i) flags,
    format-string date parsing (Java letters vs strptime %codes), TRY
    parse to NULL, epoch formatting under UTC, and fractional-second
    parse (Spark 'S' = 0.5s spelled as %g milliseconds '500' in the
    oracle).""",
)


_sql_query(
    "fn_edge_subquery_binary_bits",
    spark_sql="""
    SELECT (SELECT 1 IN (SELECT x FROM VALUES (1), (NULL) t(x)))     AS in_subq_match_wins,
           (SELECT 5 WHERE FALSE)                                    AS scalar_subq_empty_null,
           EXISTS (SELECT 1 LIMIT 0)                                 AS exists_limit0_false,
           EXISTS (SELECT NULL)                                      AS exists_null_row_true,
           (SELECT COUNT(*) FROM VALUES (1), (2) u(y) WHERE y > 0)   AS corr_count_all,
           (SELECT COUNT(*) FROM VALUES (1), (2) u(y) WHERE y > 5)   AS corr_count_none,
           hex(CAST('AB' AS BINARY))                                 AS hex_of_ascii,
           CAST(unhex('4142') AS STRING)                             AS unhex_roundtrip,
           shiftleft(CAST(1 AS BIGINT), 63)                          AS shift_to_sign_bit,
           bit_count(255)                                            AS bit_count_byte,
           12 ^ 10                                                   AS xor_infix
    """,
    duck_sql="""
    SELECT (SELECT 1 IN (SELECT x FROM (VALUES (1), (NULL)) t(x)))   AS in_subq_match_wins,
           (SELECT 5 WHERE FALSE)                                    AS scalar_subq_empty_null,
           EXISTS (SELECT 1 LIMIT 0)                                 AS exists_limit0_false,
           EXISTS (SELECT NULL)                                      AS exists_null_row_true,
           (SELECT COUNT(*) FROM (VALUES (1), (2)) u(y) WHERE y > 0) AS corr_count_all,
           (SELECT COUNT(*) FROM (VALUES (1), (2)) u(y) WHERE y > 5) AS corr_count_none,
           hex(encode('AB'))                                         AS hex_of_ascii,
           decode(unhex('4142'))                                     AS unhex_roundtrip,
           CAST(-9223372036854775808 AS BIGINT)                      AS shift_to_sign_bit,
           CAST(bit_count(255) AS INTEGER)                           AS bit_count_byte,
           xor(12, 10)                                               AS xor_infix
    """,
    tags=("functions", "edge", "subquery", "binary"),
    doc="""Subquery boolean semantics and binary/bit corners (reference
    sqllogictest subquery/ + binary.slt + bitwise.slt): IN-subquery is
    true on a match even with NULLs present, an empty scalar subquery is
    NULL, EXISTS respects LIMIT 0 and counts all-NULL rows, hex/unhex
    round-trip ASCII, shifting 1 into bit 63 produces int64 min (pinned —
    DuckDB's << widens to HUGEINT instead of wrapping), bit_count, and ^
    (Spark XOR infix; DuckDB's ^ is exponentiation, spelled xor()).
    Excluded, known: `x IN (subquery containing NULL)` with NO match —
    Spark returns false where DuckDB keeps three-valued NULL; ANY/ALL
    comparison syntax (Spark lacks it; see subquery_any_all for the
    equivalent shapes).""",
)


_sql_query(
    "fn_edge_joins_having_null",
    spark_sql="""
    SELECT (SELECT COUNT(*) FROM VALUES (1), (2) t(x) HAVING COUNT(*) > 1)  AS having_global_pass,
           (SELECT COUNT(*) FROM (SELECT COUNT(*) AS c FROM VALUES (1) t(x)
                                  HAVING COUNT(*) > 5) z)                   AS having_global_empty,
           (SELECT COUNT(*) FROM VALUES (1), (NULL) a(x)
              JOIN VALUES (1), (NULL) b(y) ON x = y)                        AS join_drops_null_keys,
           (SELECT COUNT(*) FROM VALUES (1), (NULL) a(x)
              JOIN VALUES (1), (NULL) b(y) ON x <=> y)                      AS null_safe_join_matches,
           (SELECT COUNT(*) FROM VALUES (1), (2) a(x)
              LEFT JOIN VALUES (1) b(y) ON x = y AND y > 5)                 AS left_on_filter_keeps_left,
           (SELECT COUNT(*) FROM (SELECT 1 AS k) a JOIN (SELECT 1 AS k) b USING (k)) AS using_join_count,
           (SELECT COUNT(*) FROM VALUES (1), (NULL) a(x)
              FULL JOIN VALUES (2), (NULL) b(y) ON x = y)                   AS full_join_all_unmatched,
           1 + CAST(NULL AS INT)                                            AS null_add,
           CAST(NULL AS INT) * 0                                            AS null_times_zero,
           'x' || CAST(NULL AS STRING)                                      AS null_concat_op
    """,
    duck_sql="""
    SELECT (SELECT COUNT(*) FROM (VALUES (1), (2)) t(x) HAVING COUNT(*) > 1) AS having_global_pass,
           (SELECT COUNT(*) FROM (SELECT COUNT(*) AS c FROM (VALUES (1)) t(x)
                                  HAVING COUNT(*) > 5) z)                    AS having_global_empty,
           (SELECT COUNT(*) FROM (VALUES (1), (NULL)) a(x)
              JOIN (VALUES (1), (NULL)) b(y) ON x = y)                       AS join_drops_null_keys,
           (SELECT COUNT(*) FROM (VALUES (1), (NULL)) a(x)
              JOIN (VALUES (1), (NULL)) b(y) ON x IS NOT DISTINCT FROM y)    AS null_safe_join_matches,
           (SELECT COUNT(*) FROM (VALUES (1), (2)) a(x)
              LEFT JOIN (VALUES (1)) b(y) ON x = y AND y > 5)                AS left_on_filter_keeps_left,
           (SELECT COUNT(*) FROM (SELECT 1 AS k) a JOIN (SELECT 1 AS k) b USING (k)) AS using_join_count,
           (SELECT COUNT(*) FROM (VALUES (1), (NULL)) a(x)
              FULL JOIN (VALUES (2), (NULL)) b(y) ON x = y)                  AS full_join_all_unmatched,
           1 + CAST(NULL AS INT)                                             AS null_add,
           CAST(NULL AS INT) * 0                                             AS null_times_zero,
           'x' || CAST(NULL AS VARCHAR)                                      AS null_concat_op
    """,
    tags=("functions", "edge", "join", "null"),
    doc="""Join/HAVING NULL-semantics corners (reference sqllogictest
    joins.slt + having-without-GROUP-BY blocks): a global HAVING filters
    the single implicit-group row (to zero rows when false), equality
    joins DROP NULL keys while the null-safe comparator (<=> / IS NOT
    DISTINCT FROM) matches them, a LEFT JOIN's ON-clause filter never
    eliminates left rows (it only suppresses the match), USING dedups the
    join column, FULL JOIN keeps every unmatched row from both sides,
    NULL propagates through arithmetic (even *0) and the || string
    operator.  Excluded, known: concat() — Spark is NULL-strict, DuckDB
    concat skips NULL arguments.""",
)


_sql_query(
    "fn_edge_math_domain",
    spark_sql="""
    SELECT log(2, 8.0)                                  AS log_base2,
           power(0.0, 0.0)                              AS power_zero_zero,
           isnan(power(-8.0, 1.0/3.0))                  AS power_neg_frac_nan,
           CAST(5.3 AS DOUBLE) % 2.0                    AS fmod_bitexact,
           atan2(-1.0, -1.0)                            AS atan2_third_quadrant,
           CAST(round(2.5, 0) AS DOUBLE)                AS round_half_up_away,
           CAST(bround(2.5, 0) AS DOUBLE)               AS round_half_even_banker,
           CAST(bround(3.5, 0) AS DOUBLE)               AS round_half_even_up,
           (CAST(NULL AS INT) BETWEEN 1 AND 2) IS NULL  AS between_null_is_null,
           2 BETWEEN 2 AND 2                            AS between_inclusive,
           '10' = 10                                    AS string_number_coerce,
           CAST('true' AS BOOLEAN) AND CAST('1' AS BOOLEAN) AS bool_string_casts,
           NULL OR TRUE                                 AS null_or_true,
           NULL AND FALSE                               AS null_and_false
    """,
    duck_sql="""
    SELECT log(2, 8.0)                                  AS log_base2,
           power(0.0, 0.0)                              AS power_zero_zero,
           isnan(power(-8.0, 1.0/3.0))                  AS power_neg_frac_nan,
           CAST(5.3 AS DOUBLE) % 2.0                    AS fmod_bitexact,
           atan2(-1.0, -1.0)                            AS atan2_third_quadrant,
           CAST(round(2.5, 0) AS DOUBLE)                AS round_half_up_away,
           round_even(2.5, 0)                           AS round_half_even_banker,
           round_even(3.5, 0)                           AS round_half_even_up,
           (CAST(NULL AS INT) BETWEEN 1 AND 2) IS NULL  AS between_null_is_null,
           2 BETWEEN 2 AND 2                            AS between_inclusive,
           '10' = 10                                    AS string_number_coerce,
           CAST('true' AS BOOLEAN) AND CAST('1' AS BOOLEAN) AS bool_string_casts,
           NULL OR TRUE                                 AS null_or_true,
           NULL AND FALSE                               AS null_and_false
    """,
    tags=("functions", "edge", "math", "boolean"),
    doc="""Math domain and three-valued-logic corners (reference
    sqllogictest math.slt + predicates.slt): arbitrary-base log, 0^0 = 1,
    a negative base to a fractional power is NaN in BOTH engines, float
    modulo is bit-exact IEEE, banker's rounding (bround / round_even)
    versus decimal HALF_UP round, BETWEEN is inclusive and NULL-strict,
    string-number equality coerces numerically, string-to-boolean casts,
    and the Kleene rules NULL OR TRUE = TRUE / NULL AND FALSE = FALSE.
    Excluded, known (domain-error style differs by design): ln(0)/ln(-1)
    — Spark NULL (non-ANSI) vs DuckDB -inf/error; sqrt(-1) — Spark NaN vs
    DuckDB error; cot(0) — Spark inf vs DuckDB error.""",
)


_sql_query(
    "fn_edge_identifiers_projection",
    spark_sql="""
    SELECT (SELECT X FROM (SELECT 1 AS x) t)                           AS ident_case_insensitive,
           (SELECT `My Col` FROM (SELECT 2 AS `My Col`) t)             AS quoted_space_ident,
           (SELECT `select` FROM (SELECT 3 AS `select`) t)             AS keyword_quoted_ident,
           (SELECT COUNT(*) FROM (SELECT x % 2 AS g FROM VALUES (1), (2), (3) t(x)
                                  GROUP BY 1) z)                       AS group_by_ordinal,
           (SELECT MIN(y) FROM (SELECT x + 1 AS y FROM VALUES (3), (1) t(x)
                                ORDER BY y) z)                         AS order_by_alias,
           (SELECT a FROM (SELECT * EXCEPT (b) FROM (SELECT 1 AS a, 2 AS b) t) z) AS star_except_prunes,
           (SELECT dbl1 FROM (SELECT x * 2 AS dbl, dbl + 1 AS dbl1
                              FROM (SELECT 5 AS x) t) z)               AS lateral_column_alias,
           CAST(from_utc_timestamp(TIMESTAMP '2024-03-10 01:30:00',
                                   'America/New_York') AS STRING)      AS utc_to_zone_pre_dst,
           timestampdiff(HOUR, TIMESTAMP '2024-03-14 10:00:00',
                               TIMESTAMP '2024-03-15 13:30:00')        AS ts_diff_trunc_hours,
           CAST(timestampadd(MINUTE, 90, TIMESTAMP '2024-03-14 10:00:00') AS STRING) AS ts_add_minutes,
           date_format(TIMESTAMP '2024-03-14 09:05:00', 'yyyy/MM/dd HH-mm') AS format_letters
    """,
    duck_sql="""
    SELECT (SELECT X FROM (SELECT 1 AS x) t)                           AS ident_case_insensitive,
           (SELECT "My Col" FROM (SELECT 2 AS "My Col") t)             AS quoted_space_ident,
           (SELECT "select" FROM (SELECT 3 AS "select") t)             AS keyword_quoted_ident,
           (SELECT COUNT(*) FROM (SELECT x % 2 AS g FROM (VALUES (1), (2), (3)) t(x)
                                  GROUP BY 1) z)                       AS group_by_ordinal,
           (SELECT MIN(y) FROM (SELECT x + 1 AS y FROM (VALUES (3), (1)) t(x)
                                ORDER BY y) z)                         AS order_by_alias,
           (SELECT a FROM (SELECT * EXCLUDE (b) FROM (SELECT 1 AS a, 2 AS b) t) z) AS star_except_prunes,
           (SELECT dbl1 FROM (SELECT x * 2 AS dbl, dbl + 1 AS dbl1
                              FROM (SELECT 5 AS x) t) z)               AS lateral_column_alias,
           CAST(TIMESTAMP '2024-03-10 01:30:00' AT TIME ZONE 'UTC'
                AT TIME ZONE 'America/New_York' AS VARCHAR)            AS utc_to_zone_pre_dst,
           date_diff('hour', TIMESTAMP '2024-03-14 10:00:00',
                             TIMESTAMP '2024-03-15 13:30:00')          AS ts_diff_trunc_hours,
           CAST(TIMESTAMP '2024-03-14 10:00:00' + INTERVAL 90 MINUTE AS VARCHAR) AS ts_add_minutes,
           strftime(TIMESTAMP '2024-03-14 09:05:00', '%Y/%m/%d %H-%M') AS format_letters
    """,
    tags=("functions", "edge", "identifiers", "datetime"),
    doc="""Identifier resolution and timestamp-unit corners (reference
    sqllogictest identifiers.slt + select.slt + timestamps.slt):
    case-insensitive unquoted identifiers, quoted identifiers with spaces
    and reserved words, GROUP BY ordinals, ORDER BY select-list aliases,
    SELECT * EXCEPT/EXCLUDE pruning, lateral column aliases (an alias
    referenced later in the SAME select list), UTC→zone conversion just
    before a DST boundary, whole-unit timestampdiff truncation (27h not
    27.5), minute-granular timestampadd, and format-letter rendering
    (Java letters ⇔ strftime codes).""",
)


_sql_query(
    "fn_spark_bit_get_shift",
    spark_sql="""
    SELECT bit_get(CAST(5 AS BIGINT), 0)           AS bit0_of_5,
           bit_get(CAST(5 AS BIGINT), 1)           AS bit1_of_5,
           getbit(CAST(5 AS BIGINT), 2)            AS getbit2_of_5,
           shiftright(CAST(-16 AS INT), 2)         AS arith_shift_keeps_sign,
           shiftrightunsigned(CAST(-1 AS INT), 28) AS logical_shift_zero_fill,
           ~CAST(5 AS INT)                         AS bitwise_not,
           conv('ff', 16, 10)                      AS conv_hex_to_dec,
           conv('10', 10, 2)                       AS conv_dec_to_bin,
           ROUND(cbrt(-27.0), 10)                  AS cbrt_negative,
           hypot(3.0, 4.0)                         AS hypot_345,
           negative(5)                             AS negative_fn,
           rint(2.5)                               AS rint_half_even,
           ROUND(csc(1.0) + sec(1.0), 10)          AS csc_sec_sum,
           array_join(sequence(1, 9, 3), ',')      AS sequence_with_step,
           array_join(sequence(5, 1), ',')         AS sequence_descending,
           array_join(array_repeat('x', 3), ',')   AS array_repeat_n
    """,
    duck_sql="""
    SELECT CAST((5 >> 0) & 1 AS TINYINT)           AS bit0_of_5,
           CAST((5 >> 1) & 1 AS TINYINT)           AS bit1_of_5,
           CAST((5 >> 2) & 1 AS TINYINT)           AS getbit2_of_5,
           CAST(-16 // 4 AS INT)                   AS arith_shift_keeps_sign,
           CAST(15 AS INT)                         AS logical_shift_zero_fill,
           ~CAST(5 AS INT)                         AS bitwise_not,
           CAST(255 AS VARCHAR)                    AS conv_hex_to_dec,
           CAST(1010 AS VARCHAR)                   AS conv_dec_to_bin,
           ROUND(cbrt(-27.0), 10)                  AS cbrt_negative,
           sqrt(3.0*3.0 + 4.0*4.0)                 AS hypot_345,
           CAST(-5 AS INT)                         AS negative_fn,
           round_even(2.5, 0)                      AS rint_half_even,
           ROUND(1/sin(1.0) + 1/cos(1.0), 10)      AS csc_sec_sum,
           array_to_string(generate_series(1, 9, 3), ',')  AS sequence_with_step,
           array_to_string(generate_series(5, 1, -1), ',') AS sequence_descending,
           array_to_string(['x', 'x', 'x'], ',')   AS array_repeat_n
    """,
    tags=("functions", "edge", "spark-compat", "bitwise"),
    doc="""spark/bitwise + math parity leftovers (reference sqllogictest
    spark/bitwise/{bit_get,getbit,shiftrightunsigned,bitwise_not}.slt,
    spark/math/{conv,cbrt,hypot,negative,rint,csc,sec}.slt,
    spark/array/{sequence,array_repeat}.slt): LSB-indexed bit_get/getbit
    (oracle spelled as shift-and-mask), arithmetic vs logical right
    shift, radix conversion, signed cube root (ROUND(..,10): DuckDB's
    cbrt differs in the last ulp for exact cubes), hypot, rint's
    HALF_EVEN, reciprocal trig, stepped/descending sequence, and
    array_repeat.""",
)


_sql_query(
    "fn_spark_misc_parity2",
    spark_sql="""
    SELECT assert_true(1 < 2) IS NULL                      AS assert_true_passes,
           soundex('Robert')                               AS soundex_code,
           array_join(flatten(sentences('Hi there. Bye now.')), '|') AS sentences_tokens,
           quote("O'Brien")                                AS quote_escapes,
           printf('%d-%s-%.2f', 7, 'x', CAST(1.5 AS DOUBLE)) AS printf_formats,
           CAST(to_number('12,345', '99,999') AS BIGINT)   AS to_number_grouped,
           try_to_number('abc', '999') IS NULL             AS try_to_number_null,
           is_valid_utf8('ok')                             AS utf8_valid,
           (SELECT COUNT(DISTINCT id) FROM
              (SELECT monotonically_increasing_id() AS id FROM range(100)) t) AS mono_ids_distinct
    """,
    duck_sql="""
    SELECT CAST(true AS BOOLEAN)                           AS assert_true_passes,
           CAST('R163' AS VARCHAR)                         AS soundex_code,
           CAST('Hi|there|Bye|now' AS VARCHAR)             AS sentences_tokens,
           CAST('''O\\''Brien''' AS VARCHAR)               AS quote_escapes,
           printf('%d-%s-%.2f', 7, 'x', 1.5)               AS printf_formats,
           CAST(12345 AS BIGINT)                           AS to_number_grouped,
           CAST(true AS BOOLEAN)                           AS try_to_number_null,
           CAST(true AS BOOLEAN)                           AS utf8_valid,
           CAST(100 AS BIGINT)                             AS mono_ids_distinct
    """,
    tags=("functions", "edge", "spark-compat", "misc"),
    doc="""spark/misc + string parity leftovers (reference sqllogictest
    spark/misc/{assert_true,monotonically_increasing_id}.slt,
    spark/string/{soundex,sentences,quote,printf,to_number}.slt):
    assert_true yields NULL on success (pinned via IS NULL), soundex codes, sentence/word
    tokenization, SQL-quoting with embedded apostrophes, printf format
    parity (float args must be DOUBLE — Spark rejects %f on Decimal),
    format-model number parsing with grouping separators (NULL under
    TRY on junk), UTF-8 validity, and the distinctness guarantee of
    monotonically_increasing_id (values are partition-dependent, so the
    entry pins the COUNT DISTINCT invariant, not the values).  DuckDB
    lacks quote/soundex/sentences — known answers pinned.""",
)


_sql_query(
    "fn_spark_datetime_ctor_aliases",
    spark_sql="""
    SELECT CAST(dateadd(DAY, 5, TIMESTAMP '2024-03-14 10:00:00') AS STRING) AS dateadd_unit,
           CAST(convert_timezone('UTC', 'Asia/Tokyo',
                TIMESTAMP_NTZ '2024-03-14 00:00:00') AS STRING)  AS convert_tz_fwd,
           CAST(make_timestamp_ntz(2024, 3, 14, 10, 30, 15.5) AS STRING) AS make_ts_ntz_frac,
           CAST(make_timestamp_ltz(2024, 3, 14, 10, 30, 0, 'UTC') AS STRING) AS make_ts_ltz_utc,
           CAST(to_timestamp_ntz('2024-03-14 10:00:00') AS STRING) AS to_ts_ntz,
           CAST(to_timestamp_ltz('2024-03-14 10:00:00') AS STRING) AS to_ts_ltz,
           localtimestamp() >= TIMESTAMP_NTZ '2020-01-01 00:00:00' AS localts_sane,
           to_unix_timestamp('2024-03-14 00:00:00', 'yyyy-MM-dd HH:mm:ss') AS to_unix_ts,
           CAST(date_trunc('HOUR', TIMESTAMP '2024-03-14 10:45:00') AS STRING) AS trunc_hour,
           lcase('AbC') || ucase('AbC')                          AS lcase_ucase_aliases,
           to_varchar(1234.56, '9999.99')                        AS to_varchar_model,
           CAST(try_to_binary('4142', 'hex') AS STRING)          AS try_to_binary_hex,
           try_to_binary('zz', 'hex') IS NULL                    AS try_to_binary_junk_null,
           xxhash64('spark')                                     AS xxhash64_seed42,
           try_parse_url('https://a.b/c?d=e', 'HOST')            AS try_parse_url_host,
           try_parse_url('::bad::', 'HOST') IS NULL              AS try_parse_url_bad_null,
           try_url_decode('a%20b')                               AS try_url_decode_space,
           try_url_decode('%zz') IS NULL                         AS try_url_decode_bad_null
    """,
    duck_sql="""
    SELECT CAST(TIMESTAMP '2024-03-14 10:00:00' + INTERVAL 5 DAY AS VARCHAR) AS dateadd_unit,
           CAST(TIMESTAMP '2024-03-14 00:00:00' AT TIME ZONE 'UTC'
                AT TIME ZONE 'Asia/Tokyo' AS VARCHAR)            AS convert_tz_fwd,
           CAST(make_timestamp(2024, 3, 14, 10, 30, 15.5) AS VARCHAR) AS make_ts_ntz_frac,
           CAST(make_timestamp(2024, 3, 14, 10, 30, 0.0) AS VARCHAR) AS make_ts_ltz_utc,
           CAST(TIMESTAMP '2024-03-14 10:00:00' AS VARCHAR)      AS to_ts_ntz,
           CAST(TIMESTAMP '2024-03-14 10:00:00' AS VARCHAR)      AS to_ts_ltz,
           CAST(true AS BOOLEAN)                                 AS localts_sane,
           CAST(epoch(TIMESTAMP '2024-03-14 00:00:00') AS BIGINT) AS to_unix_ts,
           CAST(date_trunc('hour', TIMESTAMP '2024-03-14 10:45:00') AS VARCHAR) AS trunc_hour,
           lcase('AbC') || ucase('AbC')                          AS lcase_ucase_aliases,
           CAST('1234.56' AS VARCHAR)                            AS to_varchar_model,
           CAST('AB' AS VARCHAR)                                 AS try_to_binary_hex,
           CAST(true AS BOOLEAN)                                 AS try_to_binary_junk_null,
           CAST(-1960931134668248110 AS BIGINT)                  AS xxhash64_seed42,
           CAST('a.b' AS VARCHAR)                                AS try_parse_url_host,
           CAST(true AS BOOLEAN)                                 AS try_parse_url_bad_null,
           CAST('a b' AS VARCHAR)                                AS try_url_decode_space,
           CAST(true AS BOOLEAN)                                 AS try_url_decode_bad_null
    """,
    tags=("functions", "edge", "spark-compat", "datetime", "url"),
    doc="""spark/datetime constructors + TRY-url/binary aliases (reference
    sqllogictest spark/datetime/{dateadd,convert_timezone,
    make_timestamp_ltz,make_timestamp_ntz,to_timestamp_ntz,
    to_timestamp_ltz,localtimestamp,to_unix_timestamp,time_trunc}.slt
    — to_timestamp_ltz equals the NTZ parse under the pinned UTC session,
    localtimestamp() reduces to a sanity boolean (clock-dependent) — spark/string/{lcase,ucase,
    to_varchar,try_to_binary}.slt, spark/url/try_*.slt,
    spark/hash/xxhash64.slt): unit-style dateadd, cross-zone conversion
    of an NTZ wall time, fractional-second timestamp constructors, epoch
    extraction via a parse format, case-change aliases, format-model
    number rendering, TRY variants yielding NULL on junk for hex/url
    inputs, and xxhash64's seed-42 known answer (no DuckDB xxhash64 —
    algorithm constant pinned).""",
)


_sql_query(
    "agg_edge_filter_distinct",
    spark_sql="""
    SELECT (SELECT COUNT(DISTINCT v) FILTER (WHERE v > 1)
            FROM VALUES (1), (2), (2), (3) t(v))                     AS filter_then_distinct,
           (SELECT SUM(v) FILTER (WHERE v IS NOT NULL)
            FROM VALUES (1), (NULL), (3) t(v))                       AS filter_skips_null,
           (SELECT AVG(v) FILTER (WHERE v > 99)
            FROM VALUES (1.0), (2.0) t(v)) IS NULL                   AS filter_to_empty_null,
           (SELECT array_join(array_sort(collect_set(v)), ',')
            FROM VALUES (2), (1), (2) t(v))                          AS set_agg_dedups,
           (SELECT listagg(s, '-') WITHIN GROUP (ORDER BY s)
            FROM VALUES ('b'), ('a') t(s))                           AS listagg_within_group,
           (SELECT array_join(transform(percentile_approx(v, array(0.25, 0.75), 1000000),
                              x -> CAST(x AS DOUBLE)), ',')
            FROM VALUES (1), (2), (3), (4) t(v))                     AS percentile_array_disc,
           (SELECT count_if(v > 1) FROM VALUES (1), (2), (3) t(v))   AS count_if_predicate,
           (SELECT any_value(v) FROM VALUES (7) t(v))                AS any_value_single
    """,
    duck_sql="""
    SELECT (SELECT COUNT(DISTINCT v) FILTER (WHERE v > 1)
            FROM (VALUES (1), (2), (2), (3)) t(v))                   AS filter_then_distinct,
           (SELECT CAST(SUM(v) FILTER (WHERE v IS NOT NULL) AS BIGINT)
            FROM (VALUES (1), (NULL), (3)) t(v))                     AS filter_skips_null,
           (SELECT AVG(v) FILTER (WHERE v > 99)
            FROM (VALUES (1.0), (2.0)) t(v)) IS NULL                 AS filter_to_empty_null,
           (SELECT array_to_string(list_sort(list(DISTINCT v)), ',')
            FROM (VALUES (2), (1), (2)) t(v))                        AS set_agg_dedups,
           (SELECT string_agg(s, '-' ORDER BY s)
            FROM (VALUES ('b'), ('a')) t(s))                         AS listagg_within_group,
           (SELECT array_to_string([CAST(quantile_disc(v, 0.25) AS DOUBLE),
                                    CAST(quantile_disc(v, 0.75) AS DOUBLE)], ',')
            FROM (VALUES (1), (2), (3), (4)) t(v))                   AS percentile_array_disc,
           (SELECT CAST(count_if(v > 1) AS BIGINT) FROM (VALUES (1), (2), (3)) t(v)) AS count_if_predicate,
           (SELECT any_value(v) FROM (VALUES (7)) t(v))              AS any_value_single
    """,
    tags=("functions", "edge", "aggregate", "filter"),
    doc="""FILTER-clause and DISTINCT aggregate combinations (reference
    sqllogictest aggregate.slt FILTER blocks + array_agg.slt +
    string_agg.slt): FILTER composes with DISTINCT, skips NULLs, and an
    all-filtered input degrades to the empty-aggregate NULL; collect_set
    dedups (order pinned via sort), listagg WITHIN GROUP ⇔ string_agg
    ORDER BY, percentile arrays return per-quantile discrete values at
    exact capacity, count_if, and single-row any_value is deterministic.
    Excluded, known: max_by on tied keys — Spark keeps the later row,
    DuckDB the earlier (both unspecified by contract).""",
)


_sql_query(
    "fn_edge_negative_zero",
    spark_sql="""
SELECT CAST('-0.0' AS DOUBLE) = CAST('0.0' AS DOUBLE)            AS eq_zeros,
       CAST('-0.0' AS DOUBLE) < CAST('0.0' AS DOUBLE)            AS lt_zeros,
       CAST('-0.0' AS DOUBLE) > CAST('0.0' AS DOUBLE)            AS gt_zeros,
       CAST('0.0' AS DOUBLE) IS DISTINCT FROM CAST('-0.0' AS DOUBLE) AS is_dist,
       CAST(CAST('-0.0' AS DOUBLE) AS STRING)                    AS neg_zero_str,
       (SELECT COUNT(DISTINCT a) FROM VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)), (CAST('0.0' AS DOUBLE)) AS v(a)) AS cnt_distinct,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT a FROM VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)), (CAST('0.0' AS DOUBLE)) AS v(a)) t) AS n_distinct_rows,
       (SELECT CAST(MAX(a + CAST('0.0' AS DOUBLE)) AS STRING) FROM (SELECT DISTINCT a FROM VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)) AS v(a)) t) AS distinct_rep_norm,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT a, CAST(a AS STRING) AS s FROM VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)), (CAST('0.0' AS DOUBLE)) AS v(a)) t) AS n_distinct_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT a, COUNT(*) AS c FROM VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)), (CAST('0.0' AS DOUBLE)) AS v(a) GROUP BY a) g) AS n_groups,
       (SELECT CAST(MAX(c) AS BIGINT) FROM (SELECT a, COUNT(*) AS c FROM VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)), (CAST('0.0' AS DOUBLE)) AS v(a) GROUP BY a) g) AS rows_in_group,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a UNION SELECT CAST('-0.0' AS DOUBLE) UNION SELECT CAST('0.0' AS DOUBLE)) t) AS n_union,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a UNION ALL SELECT CAST('-0.0' AS DOUBLE) UNION ALL SELECT CAST('0.0' AS DOUBLE)) t) AS n_union_all,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a INTERSECT SELECT CAST('-0.0' AS DOUBLE)) t) AS n_intersect,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a INTERSECT ALL SELECT CAST('-0.0' AS DOUBLE)) t) AS n_intersect_all,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a EXCEPT SELECT CAST('-0.0' AS DOUBLE)) t) AS n_except,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('-0.0' AS DOUBLE) AS a EXCEPT ALL SELECT CAST('0.0' AS DOUBLE)) t) AS n_except_all_rev,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a) t1 JOIN (SELECT CAST('-0.0' AS DOUBLE) AS b) t2 ON t1.a = t2.b) AS n_join_hash,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT /*+ MERGE(t2) */ 1 FROM (SELECT CAST('0.0' AS DOUBLE) AS a) t1 JOIN (SELECT CAST('-0.0' AS DOUBLE) AS b) t2 ON t1.a = t2.b) j) AS n_join_merge,
       (SELECT COUNT(DISTINCT a) FROM VALUES (CAST('0.0' AS FLOAT)), (CAST('-0.0' AS FLOAT)), (CAST('0.0' AS FLOAT)) AS v(a)) AS f32_cnt_distinct,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS FLOAT) AS a INTERSECT SELECT CAST('-0.0' AS FLOAT)) t) AS f32_intersect,
       CAST(CAST('-0.0' AS FLOAT) AS STRING)                     AS f32_neg_zero_str
""",
    duck_sql="""
SELECT CAST('-0.0' AS DOUBLE) = CAST('0.0' AS DOUBLE)            AS eq_zeros,
       CAST('-0.0' AS DOUBLE) < CAST('0.0' AS DOUBLE)            AS lt_zeros,
       CAST('-0.0' AS DOUBLE) > CAST('0.0' AS DOUBLE)            AS gt_zeros,
       CAST('0.0' AS DOUBLE) IS DISTINCT FROM CAST('-0.0' AS DOUBLE) AS is_dist,
       CAST(CAST('-0.0' AS DOUBLE) AS VARCHAR)                    AS neg_zero_str,
       (SELECT COUNT(DISTINCT a) FROM (VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)), (CAST('0.0' AS DOUBLE)) ) v(a)) AS cnt_distinct,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT a FROM (VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)), (CAST('0.0' AS DOUBLE)) ) v(a)) t) AS n_distinct_rows,
       (SELECT CAST(MAX(a + CAST('0.0' AS DOUBLE)) AS VARCHAR) FROM (SELECT DISTINCT a FROM (VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)) ) v(a)) t) AS distinct_rep_norm,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT a, CAST(a AS VARCHAR) AS s FROM (VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)), (CAST('0.0' AS DOUBLE)) ) v(a)) t) AS n_distinct_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT a, COUNT(*) AS c FROM (VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)), (CAST('0.0' AS DOUBLE)) ) v(a) GROUP BY a) g) AS n_groups,
       (SELECT CAST(MAX(c) AS BIGINT) FROM (SELECT a, COUNT(*) AS c FROM (VALUES (CAST('0.0' AS DOUBLE)), (CAST('-0.0' AS DOUBLE)), (CAST('0.0' AS DOUBLE)) ) v(a) GROUP BY a) g) AS rows_in_group,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a UNION SELECT CAST('-0.0' AS DOUBLE) UNION SELECT CAST('0.0' AS DOUBLE)) t) AS n_union,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a UNION ALL SELECT CAST('-0.0' AS DOUBLE) UNION ALL SELECT CAST('0.0' AS DOUBLE)) t) AS n_union_all,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a INTERSECT SELECT CAST('-0.0' AS DOUBLE)) t) AS n_intersect,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a INTERSECT ALL SELECT CAST('-0.0' AS DOUBLE)) t) AS n_intersect_all,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a EXCEPT SELECT CAST('-0.0' AS DOUBLE)) t) AS n_except,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('-0.0' AS DOUBLE) AS a EXCEPT ALL SELECT CAST('0.0' AS DOUBLE)) t) AS n_except_all_rev,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS DOUBLE) AS a) t1 JOIN (SELECT CAST('-0.0' AS DOUBLE) AS b) t2 ON t1.a = t2.b) AS n_join_hash,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT 1 FROM (SELECT CAST('0.0' AS DOUBLE) AS a) t1 JOIN (SELECT CAST('-0.0' AS DOUBLE) AS b) t2 ON t1.a = t2.b) j) AS n_join_merge,
       (SELECT COUNT(DISTINCT a) FROM (VALUES (CAST('0.0' AS FLOAT)), (CAST('-0.0' AS FLOAT)), (CAST('0.0' AS FLOAT)) ) v(a)) AS f32_cnt_distinct,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT CAST('0.0' AS FLOAT) AS a INTERSECT SELECT CAST('-0.0' AS FLOAT)) t) AS f32_intersect,
       CAST(CAST('-0.0' AS FLOAT) AS VARCHAR)                     AS f32_neg_zero_str
""",
    tags=("functions", "edge", "float", "setops"),
    doc="""Signed-zero SET semantics, mirroring the reference's dedicated
    negative_zero.slt (sqllogictest/test_files/negative_zero.slt): IEEE 754
    says +0.0 == -0.0, so DISTINCT / GROUP BY / UNION / INTERSECT / EXCEPT
    and equi-joins (hash AND sort-merge) must all treat them as ONE value
    even though the bit patterns differ — any code path hashing raw float
    bits without normalizing breaks every one of these.  Spark normalizes
    -0.0 -> +0.0 in grouping/join keys (NormalizeFloatingNumbers); DuckDB
    compares IEEE-equal.  Representative-value choice DIVERGES by design
    (Spark emits the normalized +0.0 group key, DuckDB keeps first-seen
    -0.0), so grouped keys are asserted via counts and the +0.0-normalized
    rendering, never the raw key; the sign itself is pinned by the
    CAST(-0.0 AS STRING) baselines.  The (a, CAST(a AS STRING)) pair
    distinct = 2 is the slt's 1.0/a sign-exposure trick restated without
    division (DuckDB zero-division yields NULL, Spark ANSI errors).""",
)


_sql_query(
    "window_lead_lag_extreme_offsets",
    spark_sql="""
    WITH t(id, value) AS (VALUES (1, 10), (2, 20), (3, 30))
    SELECT id,
           lead(value, 1000000000, 0)  OVER (ORDER BY id) AS lead_big_def,
           lead(value, 1000000000)     OVER (ORDER BY id) AS lead_big_null,
           lag(value, 1000000000, 0)   OVER (ORDER BY id) AS lag_big_def,
           lag(value, 1000000000)      OVER (ORDER BY id) AS lag_big_null,
           lead(value, -1000000000, 0) OVER (ORDER BY id) AS lead_negbig_def,
           lag(value, -1000000000, 0)  OVER (ORDER BY id) AS lag_negbig_def,
           lead(value, -1)             OVER (ORDER BY id) AS lead_neg1,
           lag(value, -1)              OVER (ORDER BY id) AS lag_neg1,
           lead(value, 0)              OVER (ORDER BY id) AS lead_zero,
           lag(value, 0)               OVER (ORDER BY id) AS lag_zero
    FROM t ORDER BY id
    """,
    duck_sql="""
    WITH t(id, value) AS (VALUES (1, 10), (2, 20), (3, 30))
    SELECT id,
           lead(value, 1000000000, 0)  OVER (ORDER BY id) AS lead_big_def,
           lead(value, 1000000000)     OVER (ORDER BY id) AS lead_big_null,
           lag(value, 1000000000, 0)   OVER (ORDER BY id) AS lag_big_def,
           lag(value, 1000000000)      OVER (ORDER BY id) AS lag_big_null,
           lead(value, -1000000000, 0) OVER (ORDER BY id) AS lead_negbig_def,
           lag(value, -1000000000, 0)  OVER (ORDER BY id) AS lag_negbig_def,
           lead(value, -1)             OVER (ORDER BY id) AS lead_neg1,
           lag(value, -1)              OVER (ORDER BY id) AS lag_neg1,
           lead(value, 0)              OVER (ORDER BY id) AS lead_zero,
           lag(value, 0)               OVER (ORDER BY id) AS lag_zero
    FROM t ORDER BY id
    """,
    tags=("functions", "edge", "window"),
    doc="""Extreme lead/lag offsets, mirroring the reference's
    lead_lag_extreme_offsets.slt (sqllogictest/test_files/
    lead_lag_extreme_offsets.slt, regression tests for offsets near the
    integer limits): an offset far beyond the partition size must yield
    the provided default (or NULL without one) — never panic or index
    out of bounds — and negative offsets flip lead<->lag; offset 0 is the
    row itself.  Both engines take the same SQL text.  The reference
    probes i64 extremes; Spark's offset is 32-bit and its frame
    arithmetic ANSI-overflows at exactly INT_MIN/INT_MAX, so the mirror
    pins +/-1e9 (still ~1e9 rows past either partition edge).""",
)


_sql_query(
    "fn_edge_string_numeric_coercion",
    spark_sql="""
    WITH t_int(a) AS (VALUES (1), (5), (325), (499), (1000)),
         t_float(f) AS (VALUES (CAST(1.5 AS DOUBLE)), (CAST(5.0 AS DOUBLE)),
                               (CAST(325.7 AS DOUBLE)), (CAST(499.9 AS DOUBLE)),
                               (CAST(1000.1 AS DOUBLE))),
         t_str(s) AS (VALUES ('one'), ('two'), ('three'))
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a < '5')    AS int_lt_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a > '5')    AS int_gt_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a <= '5')   AS int_le_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a >= '5')   AS int_ge_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a = '5')    AS int_eq_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a != '5')   AS int_ne_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a > '100')  AS int_gt_str100,
      (SELECT CAST(SUM(a) AS BIGINT)   FROM t_int WHERE a > '100')  AS int_gt_str100_sum,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_float WHERE f < '5')  AS flt_lt_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_float WHERE f = '5')  AS flt_eq_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_float WHERE f = '5.0') AS flt_eq_str50,
      (SELECT CAST(SUM(f) AS DOUBLE)   FROM t_float WHERE f > '5')  AS flt_gt_str5_sum,
      (SELECT COUNT(*) FROM (SELECT CAST(a AS STRING) AS u FROM t_int
                             UNION ALL SELECT s FROM t_str) x)      AS union_int_str_n,
      (SELECT MIN(u) FROM (SELECT CAST(a AS STRING) AS u FROM t_int
                           UNION ALL SELECT s FROM t_str) x)        AS union_int_str_min
""",
    duck_sql="""
    WITH t_int(a) AS (VALUES (1), (5), (325), (499), (1000)),
         t_float(f) AS (VALUES (CAST(1.5 AS DOUBLE)), (CAST(5.0 AS DOUBLE)),
                               (CAST(325.7 AS DOUBLE)), (CAST(499.9 AS DOUBLE)),
                               (CAST(1000.1 AS DOUBLE))),
         t_str(s) AS (VALUES ('one'), ('two'), ('three'))
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a < '5')    AS int_lt_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a > '5')    AS int_gt_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a <= '5')   AS int_le_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a >= '5')   AS int_ge_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a = '5')    AS int_eq_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a != '5')   AS int_ne_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_int WHERE a > '100')  AS int_gt_str100,
      (SELECT CAST(SUM(a) AS BIGINT)   FROM t_int WHERE a > '100')  AS int_gt_str100_sum,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_float WHERE f < '5')  AS flt_lt_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_float WHERE f = '5')  AS flt_eq_str5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t_float WHERE f = '5.0') AS flt_eq_str50,
      (SELECT CAST(SUM(f) AS DOUBLE)   FROM t_float WHERE f > '5')  AS flt_gt_str5_sum,
      (SELECT COUNT(*) FROM (SELECT CAST(a AS VARCHAR) AS u FROM t_int
                             UNION ALL SELECT s FROM t_str) x)      AS union_int_str_n,
      (SELECT MIN(u) FROM (SELECT CAST(a AS VARCHAR) AS u FROM t_int
                           UNION ALL SELECT s FROM t_str) x)        AS union_int_str_min
""",
    tags=("functions", "edge", "coercion"),
    doc="""String-vs-numeric comparison coercion, mirroring the reference's
    string_numeric_coercion.slt: a numeric column compared to a string
    literal must compare NUMERICALLY (the string coerces to the number
    side) — 325 > '5' is true; lexicographic '325' < '5' would invert
    half these counts.  Pinned for int and double columns across all six
    comparison operators plus the aggregated survivors (sum catches a
    wrong-row match the count alone could alias).  The int/string UNION
    mirror casts explicitly: DataFusion and DuckDB resolve that union to
    VARCHAR while Spark resolves it to BIGINT (documented divergence),
    so the common surface is the value set, not the implicit type.""",
)


_sql_query(
    "fn_edge_type_coercion",
    spark_sql="""
    SELECT CAST(DATE '2023-05-01' - INTERVAL '1' MONTH AS DATE)        AS date_minus_month,
           TIMESTAMP '2023-05-01 12:30:00' - INTERVAL '1' MONTH        AS ts_minus_month,
           CAST(DATE '2023-03-31' - INTERVAL '1' MONTH AS DATE)        AS date_month_clamp,
           CAST(DATE '2024-02-29' + INTERVAL '1' YEAR AS DATE)         AS leap_plus_year,
           TIMESTAMP '2023-05-01 12:30:00' + INTERVAL '90' MINUTE      AS ts_plus_min,
           (SELECT CAST(SUM(u) AS DOUBLE) FROM (SELECT 1 AS u UNION ALL SELECT CAST(1.1 AS DOUBLE)) x) AS union_int_dbl_sum,
           (SELECT COUNT(*) FROM (SELECT CAST(NULL AS DOUBLE) AS u UNION ALL SELECT CAST(1.1 AS DOUBLE)) x WHERE u IS NULL) AS union_null_dbl_nulls,
           (SELECT MIN(u) FROM (SELECT 'a' AS u UNION ALL SELECT CAST(CAST(1.1 AS DOUBLE) AS STRING)) x) AS union_str_dbl_min,
           (SELECT CAST(SUM(u) AS BIGINT) FROM (SELECT CAST(1 AS SMALLINT) AS u UNION ALL SELECT CAST(300 AS INT) UNION ALL SELECT CAST(70000 AS BIGINT)) x) AS union_int_widen_sum,
           (SELECT CAST(SUM(u) AS DOUBLE) FROM (SELECT CAST(1 AS TINYINT) AS u UNION ALL SELECT CAST(2.5 AS DOUBLE)) x) AS union_tiny_dbl_sum,
           'x' = 'x'                                                    AS str_self_eq,
           (1 = CAST(1.0 AS DOUBLE))                                    AS int_eq_dbl,
           (CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) > CAST(0.3 AS DOUBLE)) AS float_assoc
""",
    duck_sql="""
    SELECT CAST(DATE '2023-05-01' - INTERVAL '1' MONTH AS DATE)        AS date_minus_month,
           TIMESTAMP '2023-05-01 12:30:00' - INTERVAL '1' MONTH        AS ts_minus_month,
           CAST(DATE '2023-03-31' - INTERVAL '1' MONTH AS DATE)        AS date_month_clamp,
           CAST(DATE '2024-02-29' + INTERVAL '1' YEAR AS DATE)         AS leap_plus_year,
           TIMESTAMP '2023-05-01 12:30:00' + INTERVAL '90' MINUTE      AS ts_plus_min,
           (SELECT CAST(SUM(u) AS DOUBLE) FROM (SELECT 1 AS u UNION ALL SELECT CAST(1.1 AS DOUBLE)) x) AS union_int_dbl_sum,
           (SELECT COUNT(*) FROM (SELECT CAST(NULL AS DOUBLE) AS u UNION ALL SELECT CAST(1.1 AS DOUBLE)) x WHERE u IS NULL) AS union_null_dbl_nulls,
           (SELECT MIN(u) FROM (SELECT 'a' AS u UNION ALL SELECT CAST(CAST(1.1 AS DOUBLE) AS VARCHAR)) x) AS union_str_dbl_min,
           (SELECT CAST(SUM(u) AS BIGINT) FROM (SELECT CAST(1 AS SMALLINT) AS u UNION ALL SELECT CAST(300 AS INT) UNION ALL SELECT CAST(70000 AS BIGINT)) x) AS union_int_widen_sum,
           (SELECT CAST(SUM(u) AS DOUBLE) FROM (SELECT CAST(1 AS TINYINT) AS u UNION ALL SELECT CAST(2.5 AS DOUBLE)) x) AS union_tiny_dbl_sum,
           'x' = 'x'                                                    AS str_self_eq,
           (1 = CAST(1.0 AS DOUBLE))                                    AS int_eq_dbl,
           (CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) > CAST(0.3 AS DOUBLE)) AS float_assoc
""",
    tags=("functions", "edge", "coercion", "datetime"),
    doc="""Implicit type-coercion matrix, mirroring the reference's
    type_coercion.slt value surface (the slt is largely EXPLAIN-shape
    assertions; the value-level kernel is what transfers cross-engine):
    date/timestamp +/- month intervals including end-of-month clamping
    (Mar 31 - 1 month = Feb 28) and leap-day year arithmetic (Feb 29 +
    1 year = Feb 28), UNION branch promotions (int+double -> double,
    NULL+double keeps NULL, int widening smallint+int+bigint -> bigint,
    tinyint+double -> double), and mixed int=double equality.  The
    string+double union is cast explicitly for the same Spark-vs-DuckDB
    resolution divergence documented on fn_edge_string_numeric_coercion.""",
)


_sql_query(
    "fn_edge_in_list_typed",
    spark_sql="""
    WITH ints(label, i8, i16, i32, i64) AS (VALUES
      ('min',       CAST(-128 AS TINYINT), CAST(-32768 AS SMALLINT), CAST(-2147483648 AS INT), CAST(-9223372036854775808 AS BIGINT)),
      ('minus_one', CAST(-1 AS TINYINT),   CAST(-1 AS SMALLINT),     CAST(-1 AS INT),          CAST(-1 AS BIGINT)),
      ('zero',      CAST(0 AS TINYINT),    CAST(0 AS SMALLINT),      CAST(0 AS INT),           CAST(0 AS BIGINT)),
      ('one',       CAST(1 AS TINYINT),    CAST(1 AS SMALLINT),      CAST(1 AS INT),           CAST(1 AS BIGINT)),
      ('eleven',    CAST(11 AS TINYINT),   CAST(11 AS SMALLINT),     CAST(11 AS INT),          CAST(11 AS BIGINT)),
      ('max',       CAST(127 AS TINYINT),  CAST(32767 AS SMALLINT),  CAST(2147483647 AS INT),  CAST(9223372036854775807 AS BIGINT)),
      ('nulls',     CAST(NULL AS TINYINT), CAST(NULL AS SMALLINT),   CAST(NULL AS INT),        CAST(NULL AS BIGINT)))
    SELECT label,
           i8  IN (CAST(1 AS TINYINT), CAST(2 AS TINYINT), CAST(3 AS TINYINT), CAST(-128 AS TINYINT))   AS i8_in_min,
           i16 IN (CAST(1 AS SMALLINT), CAST(2 AS SMALLINT), CAST(3 AS SMALLINT), CAST(-32768 AS SMALLINT)) AS i16_in_min,
           i32 IN (1, 2, 3, CAST(-2147483648 AS INT))                                                   AS i32_in_min,
           i64 IN (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT), CAST(-9223372036854775808 AS BIGINT)) AS i64_in_min,
           i8  IN (CAST(-64 AS TINYINT), CAST(32 AS TINYINT), CAST(127 AS TINYINT))                     AS i8_in_max,
           i16 IN (CAST(258 AS SMALLINT), CAST(16385 AS SMALLINT), CAST(32767 AS SMALLINT))             AS i16_in_max,
           i32 IN (66051, 16909060, CAST(2147483647 AS INT))                                            AS i32_in_max,
           i64 IN (CAST(66051 AS BIGINT), CAST(9223372036854775807 AS BIGINT))                          AS i64_in_max,
           i8  NOT IN (CAST(3 AS TINYINT), CAST(4 AS TINYINT), CAST(11 AS TINYINT))                     AS i8_notin,
           i64 NOT IN (CAST(3 AS BIGINT), CAST(11 AS BIGINT))                                           AS i64_notin,
           i32 IN (NULL, 3, 11)                                                                         AS i32_in_withnull,
           i32 NOT IN (NULL, 3, 11)                                                                     AS i32_notin_withnull,
           CAST(i64 AS DOUBLE) IN (CAST(3.0 AS DOUBLE), CAST(11.0 AS DOUBLE))                           AS f64_in,
           CAST(i64 AS DOUBLE) IN (NULL, CAST(3.0 AS DOUBLE), CAST(11.0 AS DOUBLE))                     AS f64_in_withnull,
           CAST(i8 AS DECIMAL(10,2)) IN (CAST(3 AS DECIMAL(10,2)), CAST(11 AS DECIMAL(10,2)))          AS dec_in,
           CAST(i8 AS DECIMAL(10,2)) NOT IN (CAST(3 AS DECIMAL(10,2)), CAST(11 AS DECIMAL(10,2)))      AS dec_notin,
           label IN ('min', 'eleven', 'nope')                                                           AS str_in,
           label NOT IN (NULL, 'nope')                                                                  AS str_notin_withnull,
           (DATE '2024-01-01' + i8) IN (DATE '2023-12-31', DATE '2024-01-12')                           AS date_in,
           (TIMESTAMP '2024-01-01 00:00:00' + i8 * INTERVAL '1' HOUR)
               IN (TIMESTAMP '2024-01-01 11:00:00', TIMESTAMP '2023-12-31 23:00:00')                    AS ts_in
    FROM ints ORDER BY label
""",
    duck_sql="""
    WITH ints(label, i8, i16, i32, i64) AS (VALUES
      ('min',       CAST(-128 AS TINYINT), CAST(-32768 AS SMALLINT), CAST(-2147483648 AS INT), CAST(-9223372036854775808 AS BIGINT)),
      ('minus_one', CAST(-1 AS TINYINT),   CAST(-1 AS SMALLINT),     CAST(-1 AS INT),          CAST(-1 AS BIGINT)),
      ('zero',      CAST(0 AS TINYINT),    CAST(0 AS SMALLINT),      CAST(0 AS INT),           CAST(0 AS BIGINT)),
      ('one',       CAST(1 AS TINYINT),    CAST(1 AS SMALLINT),      CAST(1 AS INT),           CAST(1 AS BIGINT)),
      ('eleven',    CAST(11 AS TINYINT),   CAST(11 AS SMALLINT),     CAST(11 AS INT),          CAST(11 AS BIGINT)),
      ('max',       CAST(127 AS TINYINT),  CAST(32767 AS SMALLINT),  CAST(2147483647 AS INT),  CAST(9223372036854775807 AS BIGINT)),
      ('nulls',     CAST(NULL AS TINYINT), CAST(NULL AS SMALLINT),   CAST(NULL AS INT),        CAST(NULL AS BIGINT)))
    SELECT label,
           i8  IN (CAST(1 AS TINYINT), CAST(2 AS TINYINT), CAST(3 AS TINYINT), CAST(-128 AS TINYINT))   AS i8_in_min,
           i16 IN (CAST(1 AS SMALLINT), CAST(2 AS SMALLINT), CAST(3 AS SMALLINT), CAST(-32768 AS SMALLINT)) AS i16_in_min,
           i32 IN (1, 2, 3, CAST(-2147483648 AS INT))                                                   AS i32_in_min,
           i64 IN (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT), CAST(-9223372036854775808 AS BIGINT)) AS i64_in_min,
           i8  IN (CAST(-64 AS TINYINT), CAST(32 AS TINYINT), CAST(127 AS TINYINT))                     AS i8_in_max,
           i16 IN (CAST(258 AS SMALLINT), CAST(16385 AS SMALLINT), CAST(32767 AS SMALLINT))             AS i16_in_max,
           i32 IN (66051, 16909060, CAST(2147483647 AS INT))                                            AS i32_in_max,
           i64 IN (CAST(66051 AS BIGINT), CAST(9223372036854775807 AS BIGINT))                          AS i64_in_max,
           i8  NOT IN (CAST(3 AS TINYINT), CAST(4 AS TINYINT), CAST(11 AS TINYINT))                     AS i8_notin,
           i64 NOT IN (CAST(3 AS BIGINT), CAST(11 AS BIGINT))                                           AS i64_notin,
           i32 IN (NULL, 3, 11)                                                                         AS i32_in_withnull,
           i32 NOT IN (NULL, 3, 11)                                                                     AS i32_notin_withnull,
           CAST(i64 AS DOUBLE) IN (CAST(3.0 AS DOUBLE), CAST(11.0 AS DOUBLE))                           AS f64_in,
           CAST(i64 AS DOUBLE) IN (NULL, CAST(3.0 AS DOUBLE), CAST(11.0 AS DOUBLE))                     AS f64_in_withnull,
           CAST(i8 AS DECIMAL(10,2)) IN (CAST(3 AS DECIMAL(10,2)), CAST(11 AS DECIMAL(10,2)))          AS dec_in,
           CAST(i8 AS DECIMAL(10,2)) NOT IN (CAST(3 AS DECIMAL(10,2)), CAST(11 AS DECIMAL(10,2)))      AS dec_notin,
           label IN ('min', 'eleven', 'nope')                                                           AS str_in,
           label NOT IN (NULL, 'nope')                                                                  AS str_notin_withnull,
           (DATE '2024-01-01' + i8) IN (DATE '2023-12-31', DATE '2024-01-12')                           AS date_in,
           (TIMESTAMP '2024-01-01 00:00:00' + i8 * INTERVAL '1' HOUR)
               IN (TIMESTAMP '2024-01-01 11:00:00', TIMESTAMP '2023-12-31 23:00:00')                    AS ts_in
    FROM ints ORDER BY label
""",
    tags=("functions", "edge", "in-list"),
    doc="""Typed IN-list semantics at integer-width extremes, mirroring the
    reference's in_list.slt remainder beyond the 3VL corners already in
    fn_edge_in_list_null: every signed width (tinyint/smallint/int/bigint)
    probed at its MIN and MAX against lists containing those extremes (a
    specialized kernel that compares narrowed bytes wrongly would miss
    -128/127-class sentinels), NOT IN complements, NULL-in-list 3VL per
    width, and the float / decimal(10,2) / string / date / timestamp
    variants of the same shape.  Unsigned widths and Float16 have no Spark
    type and are documented out of scope (SURVEY §2.10).  Identical SQL
    text on both engines.""",
)


_sql_query(
    "fn_edge_timestamp_tz_parse",
    spark_sql="""
    SELECT CAST('2020-09-08T13:42:29' AS TIMESTAMP)        AS plain,
           CAST('2020-09-08T13:42:29Z' AS TIMESTAMP)       AS zulu,
           CAST('2020-09-08T13:42:29+05:00' AS TIMESTAMP)  AS plus5,
           CAST('2020-09-08T13:42:29-03:30' AS TIMESTAMP)  AS minus330,
           CAST('2020-09-08 13:42:29+00' AS TIMESTAMP)     AS plus0,
           CAST(CAST('2020-03-08 06:30:00Z' AS TIMESTAMP) AS DATE) AS date_of_instant
""",
    duck_sql="""
    SELECT CAST('2020-09-08T13:42:29' AS TIMESTAMP)        AS plain,
           CAST('2020-09-08T13:42:29Z' AS TIMESTAMP)       AS zulu,
           CAST('2020-09-08T13:42:29+05:00' AS TIMESTAMP)  AS plus5,
           CAST('2020-09-08T13:42:29-03:30' AS TIMESTAMP)  AS minus330,
           CAST('2020-09-08 13:42:29+00' AS TIMESTAMP)     AS plus0,
           CAST(CAST('2020-03-08 06:30:00Z' AS TIMESTAMP) AS DATE) AS date_of_instant
""",
    tags=("functions", "edge", "datetime", "timezone"),
    doc="""Offset-suffixed timestamp parsing, mirroring the reference's
    to_timestamp_timezone.slt under a UTC session: 'Z', '+05:00',
    '-03:30' and bare '+00' suffixes must shift the parsed instant to
    UTC (13:42+05:00 -> 08:42Z), a bare local string parses unshifted,
    and the DATE of a shifted instant is taken after normalization.
    Identical SQL both engines.  Out-of-range offsets (+25:00) DIVERGE
    by design — DuckDB wraps them, Spark rejects to NULL — and are
    excluded.""",
)


_sql_query(
    "fn_edge_floor_preimage",
    spark_sql="""
    WITH t(id, f, i, d) AS (VALUES
      (1, CAST(5.3 AS DOUBLE),  100,              CAST(100.00 AS DECIMAL(10,2))),
      (2, CAST(5.7 AS DOUBLE),  101,              CAST(100.50 AS DECIMAL(10,2))),
      (3, CAST(6.0 AS DOUBLE),  102,              CAST(101.00 AS DECIMAL(10,2))),
      (4, CAST(6.5 AS DOUBLE),  -5,               CAST(101.99 AS DECIMAL(10,2))),
      (5, CAST(7.0 AS DOUBLE),  0,                CAST(102.00 AS DECIMAL(10,2))),
      (6, CAST(-5.3 AS DOUBLE), CAST(NULL AS INT), CAST(NULL AS DECIMAL(10,2))))
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(f) = CAST(5 AS DOUBLE))   AS floor_f_eq5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(f) = CAST(6 AS DOUBLE))   AS floor_f_eq6,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(f) = CAST(-6 AS DOUBLE))  AS floor_f_eqm6,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE ceil(f) = CAST(6 AS DOUBLE))    AS ceil_f_eq6,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE ceil(f) = CAST(-5 AS DOUBLE))   AS ceil_f_eqm5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE round(f) = CAST(6 AS DOUBLE))   AS round_f_eq6,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(i) = 100)                 AS floor_i_eq100,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(i) = -5)                  AS floor_i_eqm5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(i) = 0)                   AS floor_i_eq0,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE CAST(5 AS DOUBLE) = floor(f))   AS eq5_floor_f,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(d) = CAST(100 AS DECIMAL(10,2))) AS floor_d_eq100,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(d) = CAST(101 AS DECIMAL(10,2))) AS floor_d_eq101,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(f) IS NULL)               AS floor_null,
      (SELECT CAST(SUM(CAST(floor(f) AS BIGINT)) AS BIGINT) FROM t)                 AS floor_f_sum,
      (SELECT CAST(SUM(CAST(ceil(f)  AS BIGINT)) AS BIGINT) FROM t)                 AS ceil_f_sum
""",
    duck_sql="""
    WITH t(id, f, i, d) AS (VALUES
      (1, CAST(5.3 AS DOUBLE),  100,              CAST(100.00 AS DECIMAL(10,2))),
      (2, CAST(5.7 AS DOUBLE),  101,              CAST(100.50 AS DECIMAL(10,2))),
      (3, CAST(6.0 AS DOUBLE),  102,              CAST(101.00 AS DECIMAL(10,2))),
      (4, CAST(6.5 AS DOUBLE),  -5,               CAST(101.99 AS DECIMAL(10,2))),
      (5, CAST(7.0 AS DOUBLE),  0,                CAST(102.00 AS DECIMAL(10,2))),
      (6, CAST(-5.3 AS DOUBLE), CAST(NULL AS INT), CAST(NULL AS DECIMAL(10,2))))
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(f) = CAST(5 AS DOUBLE))   AS floor_f_eq5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(f) = CAST(6 AS DOUBLE))   AS floor_f_eq6,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(f) = CAST(-6 AS DOUBLE))  AS floor_f_eqm6,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE ceil(f) = CAST(6 AS DOUBLE))    AS ceil_f_eq6,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE ceil(f) = CAST(-5 AS DOUBLE))   AS ceil_f_eqm5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE round(f) = CAST(6 AS DOUBLE))   AS round_f_eq6,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(i) = 100)                 AS floor_i_eq100,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(i) = -5)                  AS floor_i_eqm5,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(i) = 0)                   AS floor_i_eq0,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE CAST(5 AS DOUBLE) = floor(f))   AS eq5_floor_f,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(d) = CAST(100 AS DECIMAL(10,2))) AS floor_d_eq100,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(d) = CAST(101 AS DECIMAL(10,2))) AS floor_d_eq101,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE floor(f) IS NULL)               AS floor_null,
      (SELECT CAST(SUM(CAST(floor(f) AS BIGINT)) AS BIGINT) FROM t)                 AS floor_f_sum,
      (SELECT CAST(SUM(CAST(ceil(f)  AS BIGINT)) AS BIGINT) FROM t)                 AS ceil_f_sum
""",
    tags=("functions", "edge", "math"),
    doc="""floor/ceil/round equality-predicate preimages, mirroring the
    reference's floor_preimage.slt (its optimizer rewrites floor(x) = c
    into a range predicate; the assertion that transfers is that the
    SELECTED SET is unchanged): doubles at the x.0 boundary (floor(6.0)
    belongs to =6, not =5), negative preimages (floor(-5.3) = -6,
    ceil(-5.3) = -5), identity on ints including 0 and negatives,
    decimal(10,2) preimages spanning the fractional range, flipped
    literal-on-the-left comparison, NULL propagation, and sum-over-floor
    totals that would catch any off-by-one the counts alias.  Identical
    SQL both engines.""",
)


_sql_query(
    "subquery_correlated_corners",
    spark_sql="""
    WITH t1(t1_id, t1_name, t1_int) AS (VALUES
      (11, 'a', 1), (22, 'b', 2), (33, 'c', 3), (44, 'd', 4)),
    t2(t2_id, t2_name, t2_int) AS (VALUES
      (11, 'z', 3), (22, 'y', 1), (44, 'x', 3), (55, 'w', 3))
    SELECT t1_id,
           (SELECT CAST(SUM(t2_int) AS BIGINT) FROM t2 WHERE t2.t2_id = t1.t1_id) AS sum_corr,
           (SELECT CAST(SUM(t2_int * 1.0) + 1 AS DOUBLE) FROM t2 WHERE t2.t2_id = t1.t1_id) AS sum_arith,
           (SELECT CAST(SUM(t2_int) AS BIGINT) FROM t2 WHERE t2.t2_id = t1.t1_id HAVING SUM(t2_int) < 3) AS sum_having,
           (SELECT t2_int FROM t2 WHERE t2.t2_int = t1.t1_int GROUP BY t2_int) AS eq_group,
           (SELECT a FROM (SELECT 1 AS a) s WHERE a = t1.t1_int) AS derived_eq,
           EXISTS (SELECT * FROM t2 WHERE t2_id = t1_id LIMIT 1) AS exists_limit,
           t1_int IN (SELECT t2_int FROM t2 WHERE t1.t1_id > t1.t1_int) AS in_corr_pred,
           NOT EXISTS (SELECT 1 FROM t2 WHERE t2_id = t1_id AND t2_int > 2) AS not_exists,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM t2 WHERE t2.t2_id = t1.t1_id) AS count_corr
    FROM t1 ORDER BY t1_id""",
    duck_sql="""
    WITH t1(t1_id, t1_name, t1_int) AS (VALUES
      (11, 'a', 1), (22, 'b', 2), (33, 'c', 3), (44, 'd', 4)),
    t2(t2_id, t2_name, t2_int) AS (VALUES
      (11, 'z', 3), (22, 'y', 1), (44, 'x', 3), (55, 'w', 3))
    SELECT t1_id,
           (SELECT CAST(SUM(t2_int) AS BIGINT) FROM t2 WHERE t2.t2_id = t1.t1_id) AS sum_corr,
           (SELECT CAST(SUM(t2_int * 1.0) + 1 AS DOUBLE) FROM t2 WHERE t2.t2_id = t1.t1_id) AS sum_arith,
           (SELECT CAST(SUM(t2_int) AS BIGINT) FROM t2 WHERE t2.t2_id = t1.t1_id HAVING SUM(t2_int) < 3) AS sum_having,
           (SELECT t2_int FROM t2 WHERE t2.t2_int = t1.t1_int GROUP BY t2_int) AS eq_group,
           (SELECT a FROM (SELECT 1 AS a) s WHERE a = t1.t1_int) AS derived_eq,
           EXISTS (SELECT * FROM t2 WHERE t2_id = t1_id LIMIT 1) AS exists_limit,
           t1_int IN (SELECT t2_int FROM t2 WHERE t1.t1_id > t1.t1_int) AS in_corr_pred,
           NOT EXISTS (SELECT 1 FROM t2 WHERE t2_id = t1_id AND t2_int > 2) AS not_exists,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM t2 WHERE t2.t2_id = t1.t1_id) AS count_corr
    FROM t1 ORDER BY t1_id""",
    tags=("functions", "edge", "subquery"),
    doc="""Correlated-subquery decorrelation corners, mirroring the
    reference's subquery.slt t1/t2 battery (same VALUES rows): correlated
    scalar aggregates including post-aggregate arithmetic over an empty
    group (SUM(..)+1 must stay NULL, not 1), correlated HAVING that
    filters the single aggregated row, a non-aggregated correlated scalar
    made single-row by GROUP BY, a correlated filter against a derived
    one-row relation, EXISTS with LIMIT inside, a correlated IN whose
    outer predicate references only outer columns, NOT EXISTS, and the
    classic COUNT(*)-over-no-rows = 0 (not NULL) decorrelation trap.
    Identical SQL both engines.""",
)


_sql_query(
    "fn_edge_operator_matrix",
    spark_sql="""
    SELECT 7 / 2                                  AS div_double,
           CAST(7 div 2 AS BIGINT)                AS div_int,
           CAST(-7 div 2 AS BIGINT)               AS div_int_neg,
           CAST(-7 % 3 AS INT)                    AS mod_neg_lhs,
           CAST(7 % -3 AS INT)                    AS mod_neg_rhs,
           CAST(pmod(-7, 3) AS INT)               AS pmod_pos,
           CAST(12 & 10 AS INT)                   AS bit_and,
           CAST(12 | 10 AS INT)                   AS bit_or,
           CAST(12 ^ 10 AS INT)                   AS bit_xor,
           CAST(~5 AS INT)                        AS bit_not,
           CAST(negative(5) AS INT)               AS neg_five,
           CAST(positive(-5) AS INT)              AS pos_keeps_sign,
           '10' = 10                              AS str_eq_num,
           NULL AND FALSE                         AS null_and_false,
           NULL OR TRUE                           AS null_or_true,
           NULL AND TRUE                          AS null_and_true,
           NULL OR FALSE                          AS null_or_false,
           'a' || NULL                            AS concat_op_null,
           concat_ws('-', 'a', NULL, 'b')         AS concat_ws_skips
    """,
    duck_sql="""
    SELECT 7 / 2                                  AS div_double,
           CAST(7 // 2 AS BIGINT)                 AS div_int,
           CAST(-7 // 2 AS BIGINT)                AS div_int_neg,
           CAST(-7 % 3 AS INT)                    AS mod_neg_lhs,
           CAST(7 % (-3) AS INT)                  AS mod_neg_rhs,
           CAST(((-7 % 3) + 3) % 3 AS INT)        AS pmod_pos,
           CAST(12 & 10 AS INT)                   AS bit_and,
           CAST(12 | 10 AS INT)                   AS bit_or,
           CAST(xor(12, 10) AS INT)               AS bit_xor,
           CAST(~5 AS INT)                        AS bit_not,
           CAST(-(5) AS INT)                      AS neg_five,
           CAST(-5 AS INT)                        AS pos_keeps_sign,
           '10' = 10                              AS str_eq_num,
           NULL AND FALSE                         AS null_and_false,
           NULL OR TRUE                           AS null_or_true,
           NULL AND TRUE                          AS null_and_true,
           NULL OR FALSE                          AS null_or_false,
           'a' || NULL                            AS concat_op_null,
           concat_ws('-', 'a', NULL, 'b')         AS concat_ws_skips
    """,
    tags=("functions", "edge", "operator"),
    doc="""Binary-operator semantics matrix (reference operator.slt,
    predicates.slt booleans): / on integers is DOUBLE division in both
    engines (integer division is Spark `div` = DuckDB `//`, truncating
    toward zero for negatives); % takes the dividend's sign while pmod is
    always non-negative; bitwise &,|,^,~ agree (DuckDB spells xor as a
    function); positive(-5) keeps the sign; string-number comparison
    coerces numerically ('10' = 10); Kleene 3VL short-circuits NULL AND
    FALSE -> FALSE and NULL OR TRUE -> TRUE but keeps NULL elsewhere; and
    || propagates NULL where concat_ws skips it.""",
)

_sql_query(
    "setop_union_type_coercion",
    spark_sql="""
    SELECT fam, v FROM (
        SELECT 'int_dec' AS fam, CAST(x AS STRING) AS v
        FROM (SELECT CAST(1 AS INT) AS x UNION ALL SELECT 2.5)
        UNION ALL
        SELECT 'str_int', CAST(x AS STRING)
        FROM (SELECT '1' AS x UNION ALL SELECT 2)
        UNION ALL
        SELECT 'null_int', CAST(x AS STRING)
        FROM (SELECT NULL AS x UNION ALL SELECT 1)
        UNION ALL
        SELECT 'dec_widths', CAST(x AS STRING)
        FROM (SELECT CAST(1.25 AS DECIMAL(3,2)) AS x
              UNION ALL SELECT CAST(10.5 AS DECIMAL(4,1)))
    ) ORDER BY fam, v NULLS FIRST
    """,
    duck_sql="""
    SELECT fam, v FROM (
        SELECT 'int_dec' AS fam, CAST(x AS VARCHAR) AS v
        FROM (SELECT CAST(1 AS INTEGER) AS x UNION ALL SELECT 2.5) t1
        UNION ALL
        SELECT 'str_int', CAST(x AS VARCHAR)
        FROM (SELECT '1' AS x UNION ALL SELECT 2) t2
        UNION ALL
        SELECT 'null_int', CAST(x AS VARCHAR)
        FROM (SELECT NULL AS x UNION ALL SELECT 1) t3
        UNION ALL
        SELECT 'dec_widths', CAST(x AS VARCHAR)
        FROM (SELECT CAST(1.25 AS DECIMAL(3,2)) AS x
              UNION ALL SELECT CAST(10.5 AS DECIMAL(4,1))) t4
    ) ORDER BY fam, v NULLS FIRST
    """,
    tags=("setop", "edge", "coercion"),
    doc="""UNION type-unification matrix (reference union.slt type-coercion
    blocks, type_coercion.slt): INT ∪ DECIMAL(2,1) widens to DECIMAL(11,1)
    (the INT side renders '1.0'), untyped NULL adopts the other branch's
    type, and mixed decimal
    widths unify to the covering (precision, scale) so '10.5' renders
    '10.50' at scale 2.  Every branch is rendered AS STRING so the unified
    type — not just the value — is what's hashed.  Known divergence,
    documented out: STRING ∪ INT unifies numerically on Spark but to
    VARCHAR on DuckDB, so that family is rendered per-branch before the
    union (values agree, the unified type doesn't).""",
)

@query(
    "sort_group_by_ordinals",
    oracle="""
    SELECT o_orderstatus AS st, upper(o_orderpriority) AS pri_u,
           CAST(count(*) AS BIGINT) AS c
    FROM orders
    GROUP BY 1, pri_u
    ORDER BY 3 DESC, 1, 2
    LIMIT 10
    """,
    tags=("sort", "agg", "edge", "dialect"),
)
def sort_group_by_ordinals(spark, sf_dir):
    """GROUP BY / ORDER BY ordinal-and-alias surface (reference
    group_by.slt ordinal blocks, order.slt): grouping key 1 is positional
    (o_orderstatus), the second key is the select-list alias pri_u
    (spark.sql.groupByAliases / DuckDB alias binding), and the sort uses
    ordinal 3 DESC with positional tiebreaks — both dialect features the
    reference tests as first-class.  (o_orderstatus, priority) pairs make
    the LIMIT deterministic."""
    return spark.sql(f"""
    SELECT o_orderstatus AS st, upper(o_orderpriority) AS pri_u,
           count(*) AS c
    FROM parquet.`{sf_dir}/orders.parquet`
    GROUP BY 1, pri_u
    ORDER BY 3 DESC, 1, 2
    LIMIT 10
    """)


_sql_query(
    "fn_edge_limit_corners",
    spark_sql="""
    SELECT (SELECT COUNT(*) FROM (SELECT * FROM range(10) LIMIT 0) t)  AS limit_zero,
           (SELECT COUNT(*) FROM (SELECT * FROM range(10) ORDER BY id LIMIT 3) t) AS limit_in_subquery,
           (SELECT COUNT(*) FROM (SELECT * FROM range(5) ORDER BY id LIMIT 10 OFFSET 7) t) AS offset_beyond_end,
           (SELECT CAST(SUM(id) AS BIGINT) FROM (SELECT * FROM range(5) ORDER BY id LIMIT 2 OFFSET 2) t) AS offset_window_sum,
           (SELECT COUNT(*) FROM (SELECT * FROM range(3) LIMIT 100) t) AS limit_beyond_rows,
           (SELECT MAX(id) FROM (SELECT * FROM range(100) ORDER BY id DESC LIMIT 1) t) AS topk_one
    """,
    duck_sql="""
    SELECT (SELECT COUNT(*) FROM (SELECT * FROM range(10) LIMIT 0) t)  AS limit_zero,
           (SELECT COUNT(*) FROM (SELECT * FROM range(10) ORDER BY range LIMIT 3) t) AS limit_in_subquery,
           (SELECT COUNT(*) FROM (SELECT * FROM range(5) ORDER BY range LIMIT 10 OFFSET 7) t) AS offset_beyond_end,
           (SELECT CAST(SUM(range) AS BIGINT) FROM (SELECT * FROM range(5) ORDER BY range LIMIT 2 OFFSET 2) t) AS offset_window_sum,
           (SELECT COUNT(*) FROM (SELECT * FROM range(3) LIMIT 100) t) AS limit_beyond_rows,
           (SELECT MAX(range) FROM (SELECT * FROM range(100) ORDER BY range DESC LIMIT 1) t) AS topk_one
    """,
    tags=("functions", "edge", "limit"),
    doc="""LIMIT/OFFSET corner semantics (reference limit.slt,
    limit_pruning.slt, subquery_sort.slt — ORDER BY + LIMIT inside a
    subquery is load-bearing and must not be pruned away):
    LIMIT 0 produces an empty (not failing) relation,
    LIMIT inside a subquery bounds what the outer aggregate sees, OFFSET
    beyond the input yields zero rows, OFFSET+LIMIT carve a deterministic
    window under ORDER BY, LIMIT larger than the input is a no-op, and a
    sorted LIMIT 1 is the top-k degenerate case (Spark plans
    TakeOrderedAndProject — no global sort).  DuckDB's range() exposes the
    column as `range` where Spark calls it `id`; aggregates make the
    outputs schema-stable.""",
)

_sql_query(
    "agg_edge_constant_group",
    spark_sql="""
    SELECT (SELECT COUNT(*) FROM (
                SELECT 'k' AS g, COUNT(*) AS c
                FROM (SELECT 1 AS x WHERE FALSE) GROUP BY g)) AS const_group_empty_rows,
           (SELECT COUNT(*) FROM (SELECT 1 AS x WHERE FALSE)) AS global_agg_empty,
           (SELECT CAST(SUM(x) AS BIGINT) FROM (SELECT 2 AS x UNION ALL SELECT 3) GROUP BY 'k') AS const_group_sum,
           (SELECT COUNT(NULL) FROM range(4))                 AS count_null,
           (SELECT COUNT(DISTINCT NULL) FROM range(4))        AS count_distinct_null,
           (SELECT MIN('abc') FROM range(3))                  AS min_const_str,
           (SELECT CAST(AVG(CAST(2.0 AS DOUBLE)) AS DOUBLE) FROM range(3)) AS avg_const,
           (SELECT c FROM (SELECT 1 AS a, 'x' AS b, COUNT(*) AS c
                           FROM range(7) GROUP BY a, b))      AS all_const_keys_count
    """,
    duck_sql="""
    SELECT (SELECT COUNT(*) FROM (
                SELECT 'k' AS g, COUNT(*) AS c
                FROM (SELECT 1 AS x WHERE FALSE) t GROUP BY g) z) AS const_group_empty_rows,
           (SELECT COUNT(*) FROM (SELECT 1 AS x WHERE FALSE) t) AS global_agg_empty,
           (SELECT CAST(SUM(x) AS BIGINT) FROM (SELECT 2 AS x UNION ALL SELECT 3) t GROUP BY 'k') AS const_group_sum,
           (SELECT COUNT(NULL) FROM range(4))                 AS count_null,
           (SELECT COUNT(DISTINCT NULL) FROM range(4))        AS count_distinct_null,
           (SELECT MIN('abc') FROM range(3))                  AS min_const_str,
           (SELECT CAST(AVG(CAST(2.0 AS DOUBLE)) AS DOUBLE) FROM range(3)) AS avg_const,
           (SELECT c FROM (SELECT 1 AS a, 'x' AS b, COUNT(*) AS c
                           FROM range(7) GROUP BY a, b) z)    AS all_const_keys_count
    """,
    tags=("agg", "edge", "optimizer"),
    doc="""Constant-group-key and degenerate-aggregate semantics (reference
    optimizer_group_by_constant.slt, count_star_rule.slt,
    aggregates_simplify.slt): GROUP BY a constant over an EMPTY input
    yields zero groups while the global aggregate yields one zero row —
    the distinction the constant-folding rule must preserve; COUNT(NULL)
    and COUNT(DISTINCT NULL) are 0 not NULL; aggregates of constants fold
    to the constant; grouping on all-constant keys still aggregates the
    whole input into one row.""",
)


_sql_query(
    "join_empty_side_propagation",
    spark_sql="""
    SELECT (SELECT COUNT(*) FROM (SELECT 1 AS k) a
            LEFT JOIN (SELECT 1 AS k WHERE FALSE) b USING (k))     AS left_vs_empty,
           (SELECT b.k IS NULL FROM (SELECT 1 AS k) a
            LEFT JOIN (SELECT 2 AS k WHERE FALSE) b ON a.k = b.k)  AS left_pad_null,
           (SELECT COUNT(*) FROM (SELECT 1 AS k WHERE FALSE) a
            RIGHT JOIN (SELECT 1 AS k) b ON a.k = b.k)             AS right_vs_empty,
           (SELECT COUNT(*) FROM (SELECT 1 AS k WHERE FALSE) a
            FULL JOIN (SELECT 1 AS k WHERE FALSE) b ON a.k = b.k)  AS full_both_empty,
           (SELECT COUNT(*) FROM (SELECT 1 AS k) a
            JOIN (SELECT 1 AS k WHERE FALSE) b ON a.k = b.k)       AS inner_vs_empty,
           (SELECT COUNT(*) FROM (SELECT 1 AS k) a
            CROSS JOIN (SELECT 1 AS k WHERE FALSE) b)              AS cross_vs_empty
    """,
    duck_sql="""
    SELECT (SELECT COUNT(*) FROM (SELECT 1 AS k) a
            LEFT JOIN (SELECT 1 AS k WHERE FALSE) b USING (k))     AS left_vs_empty,
           (SELECT b.k IS NULL FROM (SELECT 1 AS k) a
            LEFT JOIN (SELECT 2 AS k WHERE FALSE) b ON a.k = b.k)  AS left_pad_null,
           (SELECT COUNT(*) FROM (SELECT 1 AS k WHERE FALSE) a
            RIGHT JOIN (SELECT 1 AS k) b ON a.k = b.k)             AS right_vs_empty,
           (SELECT COUNT(*) FROM (SELECT 1 AS k WHERE FALSE) a
            FULL JOIN (SELECT 1 AS k WHERE FALSE) b ON a.k = b.k)  AS full_both_empty,
           (SELECT COUNT(*) FROM (SELECT 1 AS k) a
            JOIN (SELECT 1 AS k WHERE FALSE) b ON a.k = b.k)       AS inner_vs_empty,
           (SELECT COUNT(*) FROM (SELECT 1 AS k) a
            CROSS JOIN (SELECT 1 AS k WHERE FALSE) b)              AS cross_vs_empty
    """,
    tags=("join", "edge", "optimizer"),
    doc="""Empty-relation propagation through joins (reference
    propagate_empty_relation_outer_join.slt, eliminate_outer_join.slt):
    a provably-empty build side must NOT empty an outer join — LEFT/RIGHT
    preserve the non-empty side with NULL padding — while inner and cross
    joins DO collapse to empty, and FULL of two empties is empty.  The
    distinction is exactly what the reference's PropagateEmptyRelation
    rule must preserve; Catalyst's equivalent folds these at plan time
    and must agree with DuckDB's runtime results.""",
)


@query(
    "fn_edge_datetime_arith_matrix",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) - DATE '1994-01-01' AS BIGINT) AS days_since,
           CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 AS INT)      AS d_plus_int,
           CAST(epoch(CAST(o_orderdate AS TIMESTAMP))
                - epoch(TIMESTAMP '1994-01-01 00:00:00') AS BIGINT)      AS ts_diff_s,
           CAST(o_orderdate AS TIMESTAMP) + (- INTERVAL 3 DAY)           AS neg_interval,
           CAST(o_orderdate AS TIMESTAMP)
                + INTERVAL 1 DAY * CAST(o_orderkey % 5 AS BIGINT)        AS ival_scaled_int,
           CAST(o_orderdate AS TIMESTAMP)
                + to_seconds(CAST(86400 * 2.5 AS BIGINT))                AS ival_scaled_frac,
           CAST(o_orderdate AS DATE) < DATE '1996-01-01'                 AS date_cmp
    FROM orders WHERE o_orderkey < 300
    """,
    tags=("functions", "edge", "datetime"),
)
def fn_edge_datetime_arith_matrix(spark, sf_dir):
    """Temporal-arithmetic operator matrix (reference datetime/
    {arith_date_date,arith_date_integer,arith_timestamp_timestamp,
    arith_negate_interval,arith_interval_double,arith_timestamp_interval}
    .slt): date−date as day counts (Spark datediff ⇔ DuckDB date
    subtraction), date+integer day offsets, timestamp−timestamp as epoch
    seconds, unary-negated intervals, intervals scaled by an integer
    column and by a fractional constant (Spark INTERVAL*2.5 ⇔ DuckDB
    to_seconds — DuckDB's `*` rejects INTERVAL×DECIMAL), and date
    comparison.  Time-typed arithmetic (arith_time_*.slt) is out of
    scope: Spark has no TIME type (documented, SURVEY §2.10)."""
    return spark.sql(f"""
    SELECT o_orderkey,
           CAST(datediff(CAST(o_orderdate AS DATE), DATE '1994-01-01') AS BIGINT) AS days_since,
           date_add(CAST(o_orderdate AS DATE), CAST(o_orderkey % 30 AS INT))      AS d_plus_int,
           CAST(unix_timestamp(CAST(o_orderdate AS TIMESTAMP))
                - unix_timestamp(TIMESTAMP '1994-01-01 00:00:00') AS BIGINT)      AS ts_diff_s,
           CAST(o_orderdate AS TIMESTAMP) + (- INTERVAL 3 DAY)                    AS neg_interval,
           CAST(o_orderdate AS TIMESTAMP)
                + INTERVAL '1' DAY * (o_orderkey % 5)                             AS ival_scaled_int,
           CAST(o_orderdate AS TIMESTAMP) + INTERVAL '1' DAY * 2.5               AS ival_scaled_frac,
           CAST(o_orderdate AS DATE) < DATE '1996-01-01'                          AS date_cmp
    FROM parquet.`{sf_dir}/orders.parquet` WHERE o_orderkey < 300
    """)


_sql_query(
    "fn_edge_array_minmax_ops",
    spark_sql="""
    SELECT array_min(array(3,1,2))                              AS amin,
           array_max(array(3,1,2))                              AS amax,
           array_min(array(1,NULL,3))                           AS amin_skips_null,
           array_min(CAST(array() AS ARRAY<INT>))               AS amin_empty,
           array_join(array(1,2) || array(3), ',')              AS concat_op,
           array_join(CAST(array() AS ARRAY<INT>) || array(1), ',') AS concat_empty,
           array(1,2) = array(1,2)                              AS arr_eq,
           array(1,2) < array(1,3)                              AS arr_lt_lex,
           array(1) < array(1,0)                                AS arr_lt_prefix,
           array_join(CAST(array(1,2) AS ARRAY<DOUBLE>), ',')   AS cast_int_double,
           array_join(CAST(array('1','2') AS ARRAY<INT>), ',')  AS cast_str_int,
           array_join(array_compact(array(1,NULL,2)), ',')      AS compacted,
           CAST(array_position(array(10,20,30), 20) AS BIGINT)  AS pos_found,
           CAST(array_position(array(10), 99) AS BIGINT)        AS pos_missing,
           array_contains(array(1,NULL), 1)                     AS contains_with_null
    """,
    duck_sql="""
    SELECT list_min([3,1,2])                                    AS amin,
           list_max([3,1,2])                                    AS amax,
           list_min([1,NULL,3])                                 AS amin_skips_null,
           list_min([]::INT[])                                  AS amin_empty,
           array_to_string([1,2] || [3], ',')                   AS concat_op,
           array_to_string([]::INT[] || [1], ',')               AS concat_empty,
           [1,2] = [1,2]                                        AS arr_eq,
           [1,2] < [1,3]                                        AS arr_lt_lex,
           [1] < [1,0]                                          AS arr_lt_prefix,
           array_to_string(CAST([1,2] AS DOUBLE[]), ',')        AS cast_int_double,
           array_to_string(CAST(['1','2'] AS INT[]), ',')       AS cast_str_int,
           array_to_string(list_filter([1,NULL,2], x -> x IS NOT NULL), ',') AS compacted,
           CAST(list_position([10,20,30], 20) AS BIGINT)        AS pos_found,
           CAST(list_position([10], 99) AS BIGINT)              AS pos_missing,
           list_contains([1,NULL], 1)                           AS contains_with_null
    """,
    tags=("nested", "edge", "array"),
    doc="""Array min/max, operators and casts (reference array/
    {array_min_max,array_operators,array_cast,array_position}.slt):
    array_min/max SKIP NULL elements and return NULL on empty; || is
    element concat with empty identity; comparison is lexicographic with
    the shorter-prefix-sorts-first rule; CAST re-types elements
    (int→double, string→int); array_compact ⇔ list_filter NOT NULL;
    position is 1-based with 0 for not-found in BOTH engines (DataFusion
    documents the same convention).  Array-valued outputs are rendered
    with array_join/array_to_string (house rule: the driver harness
    hashes via pandas factorize, which cannot hash list cells).""",
)


_sql_query(
    "fn_vector_distance_corners",
    spark_sql="""
    WITH t AS (
      SELECT * FROM VALUES
        (1,  array(1.0D, 0.0D),               array(0.0D, 1.0D)),
        (2,  array(1.0D, 2.0D, 3.0D),         array(1.0D, 2.0D, 3.0D)),
        (3,  array(1.0D, 0.0D),               array(-1.0D, 0.0D)),
        (4,  array(1.0D, 0.0D),               array(1.0D, 1.0D)),
        (5,  array(0.0D, 0.0D),               array(1.0D, 2.0D)),
        (6,  CAST(NULL AS ARRAY<DOUBLE>),     array(1.0D, 2.0D)),
        (7,  array(1.0D, 2.0D),               CAST(NULL AS ARRAY<DOUBLE>)),
        (8,  array(1.0D, 2.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D, 3.0D)),
        (9,  CAST(array() AS ARRAY<DOUBLE>),  CAST(array() AS ARRAY<DOUBLE>)),
        (10, array(3.0D, 4.0D),               array(4.0D, 3.0D))
        AS t(id, a, b)
    ),
    m AS (
      SELECT id, a, b,
             (a IS NULL OR b IS NULL
              OR exists(a, x -> x IS NULL)
              OR exists(b, x -> x IS NULL)) AS tainted,
             aggregate(zip_with(a, b, (x, y) -> x * y),
                       CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS dot,
             sqrt(aggregate(transform(a, x -> x * x),
                            CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)) AS na,
             sqrt(aggregate(transform(b, x -> x * x),
                            CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)) AS nb
      FROM t
    )
    SELECT id,
           CASE WHEN tainted THEN CAST(NULL AS DOUBLE)
                ELSE round(1.0D - dot / nullif(na * nb, 0.0D), 3) + 0.0D
                END AS cos_dist,
           CASE WHEN tainted THEN CAST(NULL AS DOUBLE)
                ELSE round(dot, 6) + 0.0D END AS inner_prod,
           CASE WHEN a IS NULL OR exists(a, x -> x IS NULL)
                     OR na = 0.0D THEN CAST(NULL AS STRING)
                ELSE array_join(transform(a,
                     x -> CAST(round(x / na, 4) + 0.0D AS STRING)), ',')
                END AS norm_a
    FROM m ORDER BY id
    """,
    duck_sql="""
    WITH t AS (
      SELECT * FROM (VALUES
        (1,  [1.0, 0.0]::DOUBLE[],        [0.0, 1.0]::DOUBLE[]),
        (2,  [1.0, 2.0, 3.0]::DOUBLE[],   [1.0, 2.0, 3.0]::DOUBLE[]),
        (3,  [1.0, 0.0]::DOUBLE[],        [-1.0, 0.0]::DOUBLE[]),
        (4,  [1.0, 0.0]::DOUBLE[],        [1.0, 1.0]::DOUBLE[]),
        (5,  [0.0, 0.0]::DOUBLE[],        [1.0, 2.0]::DOUBLE[]),
        (6,  NULL::DOUBLE[],              [1.0, 2.0]::DOUBLE[]),
        (7,  [1.0, 2.0]::DOUBLE[],        NULL::DOUBLE[]),
        (8,  [1.0, 2.0, NULL]::DOUBLE[],  [1.0, 2.0, 3.0]::DOUBLE[]),
        (9,  []::DOUBLE[],                []::DOUBLE[]),
        (10, [3.0, 4.0]::DOUBLE[],        [4.0, 3.0]::DOUBLE[])
      ) AS t(id, a, b)
    ),
    m AS (
      SELECT id, a, b,
             (a IS NULL OR b IS NULL
              OR len(list_filter(a, x -> x IS NULL)) > 0
              OR len(list_filter(b, x -> x IS NULL)) > 0) AS tainted,
             COALESCE(list_sum(list_transform(list_zip(a, b),
                                              p -> p[1] * p[2])), 0.0) AS dot,
             sqrt(COALESCE(list_sum(list_transform(a, x -> x * x)), 0.0)) AS na,
             sqrt(COALESCE(list_sum(list_transform(b, x -> x * x)), 0.0)) AS nb
      FROM t
    )
    SELECT id,
           CASE WHEN tainted THEN NULL::DOUBLE
                ELSE round(1.0 - dot / nullif(na * nb, 0.0), 3) + 0.0
                END AS cos_dist,
           CASE WHEN tainted THEN NULL::DOUBLE
                ELSE round(dot, 6) + 0.0 END AS inner_prod,
           CASE WHEN a IS NULL OR len(list_filter(a, x -> x IS NULL)) > 0
                     OR na = 0.0 THEN NULL::VARCHAR
                ELSE array_to_string(list_transform(a,
                     x -> CAST(round(x / na, 4) + 0.0 AS VARCHAR)), ',')
                END AS norm_a
    FROM m ORDER BY id
    """,
    tags=("nested", "edge", "vector"),
    doc="""Vector distance corner semantics (reference cosine_distance
    .slt / inner_product.slt / array_normalize.slt — functions-nested/
    src/{cosine_distance,inner_product,array_normalize}.rs): cosine
    distance of a zero vector or an empty vector is NULL (undefined
    magnitude), inner product of zero/empty vectors is 0 (well-defined
    fold seed), a bare NULL list or a NULL ELEMENT anywhere NULLs the
    whole result for all three, and normalize divides by the L2 norm
    with zero-norm -> NULL.  Both sides spell the semantics from first
    principles (fold/zip_with on Spark, list_sum/list_zip on DuckDB)
    because neither engine ships these functions natively; the empty-
    array fold seed (Spark aggregate seed 0.0 vs DuckDB list_sum([])
    -> NULL, coalesced) is the one engine gap the mirror pins.
    Normalized vectors render via array_join (house no-array-cell
    rule).  Reference mismatched-length/zero-arg cases are plan-time
    errors -> covered by the error-parity suite pattern, not here.""",
)


_sql_query(
    "fn_array_reduce_corners",
    spark_sql="""
    WITH t AS (
      SELECT * FROM VALUES
        (1, array(1.0D, 2.0D, 3.0D),   CAST(2.0 AS DOUBLE), array(10.0D, 20.0D, 30.0D)),
        (2, array(5.0D),               CAST(3.0 AS DOUBLE), array(7.0D)),
        (3, array(-1.0D, -2.0D, -3.0D), CAST(-1.0 AS DOUBLE), array(-1.0D, 2.0D, -3.0D)),
        (4, array(1.0D, -1.0D, 2.0D, -2.0D), CAST(0.5 AS DOUBLE), array(4.0D, 3.0D, 2.0D, 1.0D)),
        (5, CAST(array() AS ARRAY<DOUBLE>), CAST(2.0 AS DOUBLE), CAST(array() AS ARRAY<DOUBLE>)),
        (6, CAST(NULL AS ARRAY<DOUBLE>), CAST(2.0 AS DOUBLE), CAST(NULL AS ARRAY<DOUBLE>)),
        (7, array(1.0D, CAST(NULL AS DOUBLE), 3.0D), CAST(NULL AS DOUBLE), array(10.0D, 20.0D, 30.0D)),
        (8, array(CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)), CAST(1.0 AS DOUBLE), array(CAST(NULL AS DOUBLE), 20.0D)),
        (9, array(2.0D, CAST(NULL AS DOUBLE), 3.0D), CAST(2.0 AS DOUBLE), array(CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), 30.0D))
        AS t(id, v, s, b)
    ),
    m AS (
      SELECT id, v, s, b,
             filter(v, x -> x IS NOT NULL) AS nn
      FROM t
    )
    SELECT id,
           CASE WHEN v IS NULL OR size(nn) = 0 THEN CAST(NULL AS DOUBLE)
                ELSE round(aggregate(nn, 0.0D, (a, x) -> a + x), 6) + 0.0D
                END AS arr_sum,
           CASE WHEN v IS NULL OR size(nn) = 0 THEN CAST(NULL AS DOUBLE)
                ELSE round(aggregate(nn, 0.0D, (a, x) -> a + x)
                           / size(nn), 6) + 0.0D END AS arr_avg,
           CASE WHEN v IS NULL OR size(nn) = 0 THEN CAST(NULL AS DOUBLE)
                ELSE round(aggregate(nn, 1.0D, (a, x) -> a * x), 6) + 0.0D
                END AS arr_prod,
           CASE WHEN v IS NULL OR s IS NULL THEN CAST(NULL AS STRING)
                ELSE array_join(transform(v, x -> coalesce(
                         CAST(round(x * s, 4) + 0.0D AS STRING), 'NULL')),
                     ',') END AS scale_str,
           CASE WHEN v IS NULL OR b IS NULL THEN CAST(NULL AS STRING)
                ELSE array_join(zip_with(v, b, (x, y) -> coalesce(
                         CAST(round(x + y, 4) + 0.0D AS STRING), 'NULL')),
                     ',') END AS add_str,
           CASE WHEN v IS NULL OR b IS NULL THEN CAST(NULL AS STRING)
                ELSE array_join(zip_with(v, b, (x, y) -> coalesce(
                         CAST(round(x - y, 4) + 0.0D AS STRING), 'NULL')),
                     ',') END AS sub_str
    FROM m ORDER BY id
    """,
    duck_sql="""
    WITH t AS (
      SELECT * FROM (VALUES
        (1, [1.0, 2.0, 3.0]::DOUBLE[],        2.0::DOUBLE, [10.0, 20.0, 30.0]::DOUBLE[]),
        (2, [5.0]::DOUBLE[],                  3.0::DOUBLE, [7.0]::DOUBLE[]),
        (3, [-1.0, -2.0, -3.0]::DOUBLE[],     -1.0::DOUBLE, [-1.0, 2.0, -3.0]::DOUBLE[]),
        (4, [1.0, -1.0, 2.0, -2.0]::DOUBLE[], 0.5::DOUBLE, [4.0, 3.0, 2.0, 1.0]::DOUBLE[]),
        (5, []::DOUBLE[],                     2.0::DOUBLE, []::DOUBLE[]),
        (6, NULL::DOUBLE[],                   2.0::DOUBLE, NULL::DOUBLE[]),
        (7, [1.0, NULL, 3.0]::DOUBLE[],       NULL::DOUBLE, [10.0, 20.0, 30.0]::DOUBLE[]),
        (8, [NULL, NULL]::DOUBLE[],           1.0::DOUBLE, [NULL, 20.0]::DOUBLE[]),
        (9, [2.0, NULL, 3.0]::DOUBLE[],       2.0::DOUBLE, [NULL, NULL, 30.0]::DOUBLE[])
      ) AS t(id, v, s, b)
    ),
    m AS (
      SELECT id, v, s, b,
             list_filter(v, x -> x IS NOT NULL) AS nn
      FROM t
    )
    SELECT id,
           CASE WHEN v IS NULL OR len(nn) = 0 THEN NULL::DOUBLE
                ELSE round(list_sum(nn), 6) + 0.0 END AS arr_sum,
           CASE WHEN v IS NULL OR len(nn) = 0 THEN NULL::DOUBLE
                ELSE round(list_avg(nn), 6) + 0.0 END AS arr_avg,
           CASE WHEN v IS NULL OR len(nn) = 0 THEN NULL::DOUBLE
                ELSE round(list_aggregate(nn, 'product'), 6) + 0.0
                END AS arr_prod,
           CASE WHEN v IS NULL OR s IS NULL THEN NULL::VARCHAR
                ELSE COALESCE(array_to_string(list_transform(v, x -> COALESCE(
                         CAST(round(x * s, 4) + 0.0 AS VARCHAR), 'NULL')),
                     ','), '') END AS scale_str,
           CASE WHEN v IS NULL OR b IS NULL THEN NULL::VARCHAR
                ELSE COALESCE(array_to_string(list_transform(list_zip(v, b),
                         p -> COALESCE(CAST(round(p[1] + p[2], 4) + 0.0
                                            AS VARCHAR), 'NULL')),
                     ','), '') END AS add_str,
           CASE WHEN v IS NULL OR b IS NULL THEN NULL::VARCHAR
                ELSE COALESCE(array_to_string(list_transform(list_zip(v, b),
                         p -> COALESCE(CAST(round(p[1] - p[2], 4) + 0.0
                                            AS VARCHAR), 'NULL')),
                     ','), '') END AS sub_str
    FROM m ORDER BY id
    """,
    tags=("nested", "edge", "array"),
    doc="""Array reduction + element-wise arithmetic corner semantics
    (reference array_sum.slt / array_avg.slt / array_product.slt /
    array_scale.slt / array_add.slt / array_subtract.slt): reductions
    SKIP NULL elements (sum [1,NULL,3] -> 4, product [2,NULL,3] -> 6),
    and return NULL for empty, all-NULL and bare-NULL inputs (SQL
    SUM-of-empty-set convention); scale multiplies element-wise with a
    bare-NULL scalar or list nulling the whole row but an empty list
    scaling to an empty list; add/subtract propagate NULL PER POSITION
    (zip_with semantics — [1,NULL,3]+[10,20,30] -> [11,NULL,33]), with
    NULLs at different positions both surviving.  Spark spells the
    skip-reductions as fold-over-filter(NOT NULL) with explicit empty
    guards (aggregate's seed would otherwise turn empty into 0/1);
    element-wise outputs render via array_join with per-element NULL
    coalescing since array_join/array_to_string DROP null elements in
    both engines (and DuckDB's array_to_string of an EMPTY list is
    NULL where Spark's array_join is '' — coalesced oracle-side).  round()+0.0 normalizes -0.0 products (house
    bit-exact hash rule).""",
)


_sql_query(
    "fn_edge_where_three_valued",
    spark_sql="""
    SELECT * FROM (
      SELECT 1 AS q, 'where_null'     AS lab WHERE CAST(NULL AS BOOLEAN)
      UNION ALL SELECT 2, 'null_and_true'  WHERE NULL AND 1 = 1
      UNION ALL SELECT 3, 'null_or_true'   WHERE NULL OR 1 = 1
      UNION ALL SELECT 4, 'null_or_false'  WHERE NULL OR 1 = 2
      UNION ALL SELECT 5, 'not_null'       WHERE NOT NULL
      UNION ALL SELECT 6, 'true_and_not_null_is_null' WHERE (1 = 1) AND (NULL IS NULL)
    ) u ORDER BY q
    """,
    duck_sql="""
    SELECT * FROM (
      SELECT 1 AS q, 'where_null'     AS lab WHERE NULL
      UNION ALL SELECT 2, 'null_and_true'  WHERE NULL AND 1 = 1
      UNION ALL SELECT 3, 'null_or_true'   WHERE NULL OR 1 = 1
      UNION ALL SELECT 4, 'null_or_false'  WHERE NULL OR 1 = 2
      UNION ALL SELECT 5, 'not_null'       WHERE NOT NULL
      UNION ALL SELECT 6, 'true_and_not_null_is_null' WHERE (1 = 1) AND (NULL IS NULL)
    ) u ORDER BY q
    """,
    tags=("functions", "edge", "filter"),
    doc="""WHERE-clause three-valued logic with literal NULL (reference
    misc.slt): WHERE NULL filters everything (NULL is not TRUE),
    NULL AND TRUE stays NULL (row dropped), NULL OR TRUE is TRUE (row
    kept), NULL OR FALSE is NULL (dropped), NOT NULL is NULL
    (dropped), and IS NULL predicates are two-valued.  ONE pinned
    divergence: the reference and DuckDB coerce a BARE untyped NULL
    to BOOLEAN in filter position, but Spark rejects it
    (DATATYPE_MISMATCH.FILTER_NOT_BOOLEAN — VOID is only coerced
    inside a boolean operator) so the Spark text spells
    CAST(NULL AS BOOLEAN); inside AND/OR/NOT both coerce alike.  The reference's non-boolean-filter error ('foo' in
    WHERE) is a plan error in BOTH engines -> error-parity territory,
    not value territory.""",
)


_sql_query(
    "join_inequality_only_pwmj",
    spark_sql="""
    WITH t1 AS (
      SELECT * FROM VALUES (11), (22), (33), (44),
                           (CAST(NULL AS INT)) AS t(t1_id)
    ),
    t2 AS (
      SELECT * FROM VALUES (11, 'z', 3), (22, 'y', 1), (44, 'x', 3),
                           (55, 'w', 3), (CAST(NULL AS INT), 'v', 9)
        AS t(t2_id, t2_name, t2_int)
    )
    SELECT t1.t1_id, t2.t2_id, t2.t2_name
    FROM t1 JOIN t2 ON t1.t1_id > t2.t2_id
    WHERE t1.t1_id > 10 AND t2.t2_int > 1
    ORDER BY t1_id, t2_id
    """,
    duck_sql="""
    WITH t1(t1_id) AS (VALUES (11), (22), (33), (44), (NULL)),
    t2(t2_id, t2_name, t2_int) AS (
      VALUES (11, 'z', 3), (22, 'y', 1), (44, 'x', 3),
             (55, 'w', 3), (NULL, 'v', 9)
    )
    SELECT t1.t1_id, t2.t2_id, t2.t2_name
    FROM t1 JOIN t2 ON t1.t1_id > t2.t2_id
    WHERE t1.t1_id > 10 AND t2.t2_int > 1
    ORDER BY t1_id, t2_id
    """,
    tags=("join", "edge", "range"),
    doc="""Pure-inequality join (reference pwmj.slt — the piecewise
    merge join optimizer rule for single-inequality ON conditions):
    ON t1_id > t2_id with no equi-conjunct, residual filters on both
    sides, NULL keys matching nothing.  The reference sorts both
    sides and merges piecewise; Spark plans a
    BroadcastNestedLoopJoin with the smaller side broadcast, which is
    the right call when one side is dimension-sized — and when BOTH
    sides are fact-sized the in-repo scale path is the binned range
    join (relational.py join_range_binned: bucket both sides by
    value range, equi-join on bucket, filter inside) which restores
    an equi-shuffle shape.  Filters still push below the join on
    both engines.""",
)


@query(
    "filter_simplify_range_conjuncts",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey > 100 AND l_orderkey > 200) AS BIGINT)
               AS n_gt_gt,
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey > 100 AND l_orderkey >= 200) AS BIGINT)
               AS n_gt_ge,
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey < 1000 AND l_orderkey <= 800) AS BIGINT)
               AS n_lt_le,
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey = 7 AND l_orderkey = 7) AS BIGINT)
               AS n_eq_dup,
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey = 7 AND l_orderkey = 6) AS BIGINT)
               AS n_eq_contra,
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey = 7 AND l_orderkey < 2) AS BIGINT)
               AS n_eq_range_contra,
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey > 200 AND l_quantity < 10
                   AND l_orderkey > 100 AND l_quantity < 8) AS BIGINT)
               AS n_two_col
    """,
    tags=("filter", "edge", "plan"),
)
def filter_simplify_range_conjuncts(spark, sf_dir):
    """Redundant/contradictory range-conjunct filters (reference
    simplify_predicates.slt): x>5 AND x>6, x>5 AND x>=6, duplicate
    equalities, contradictory equalities (-> 0 rows), equality-vs-range
    contradictions, and multi-column mixes -- the reference's
    SimplifyPredicates rewrites these to the tightest single predicate
    (or EmptyRelation).  Catalyst folds duplicate conjuncts via
    BooleanSimplification but keeps non-identical range pairs; the
    VALUE result is identical, and at the SCAN both conjuncts reach
    parquet as PushedFilters where row-group min/max stats prune the
    same row groups the simplified predicate would -- the scan-level
    outcome the simplification exists for.  Pinned against real
    lineitem counts so the filters actually prune."""
    li = f"parquet.`{sf_dir}/lineitem.parquet`"
    return spark.sql(f"""
    SELECT CAST((SELECT COUNT(*) FROM {li}
                 WHERE l_orderkey > 100 AND l_orderkey > 200) AS BIGINT)
               AS n_gt_gt,
           CAST((SELECT COUNT(*) FROM {li}
                 WHERE l_orderkey > 100 AND l_orderkey >= 200) AS BIGINT)
               AS n_gt_ge,
           CAST((SELECT COUNT(*) FROM {li}
                 WHERE l_orderkey < 1000 AND l_orderkey <= 800) AS BIGINT)
               AS n_lt_le,
           CAST((SELECT COUNT(*) FROM {li}
                 WHERE l_orderkey = 7 AND l_orderkey = 7) AS BIGINT)
               AS n_eq_dup,
           CAST((SELECT COUNT(*) FROM {li}
                 WHERE l_orderkey = 7 AND l_orderkey = 6) AS BIGINT)
               AS n_eq_contra,
           CAST((SELECT COUNT(*) FROM {li}
                 WHERE l_orderkey = 7 AND l_orderkey < 2) AS BIGINT)
               AS n_eq_range_contra,
           CAST((SELECT COUNT(*) FROM {li}
                 WHERE l_orderkey > 200 AND l_quantity < 10
                   AND l_orderkey > 100 AND l_quantity < 8) AS BIGINT)
               AS n_two_col
    """)


_sql_query(
    "fn_name_resolution_corners",
    spark_sql="""
    WITH src AS (
      SELECT * FROM VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'x'),
                           (4, 40, 'y') AS s(a, `f.c1`, grp)
    )
    SELECT g AS grp_alias,
           CAST(SUM(x) AS BIGINT)     AS sum_x,
           CAST(SUM(y) AS BIGINT)     AS sum_y,
           CAST(SUM(x + 1) AS BIGINT) AS sum_x1,
           (SELECT x2 FROM (SELECT 1 AS x0, x0 + 1 AS x1_,
                                   x1_ * 10 AS x2)) AS lateral_chain,
           (SELECT COUNT(*) FROM (SELECT t.* FROM
                (SELECT 1 AS a, 2 AS b) t)) AS qualified_star_cnt,
           (SELECT COUNT(*) FROM (SELECT * EXCEPT (b) FROM
                (SELECT 1 AS a, 2 AS b) t)) AS star_except_cnt
    FROM (SELECT a, `f.c1`, grp FROM src) AS f(x, y, g)
    GROUP BY grp_alias
    ORDER BY grp_alias
    """,
    duck_sql="""
    WITH src AS (
      SELECT * FROM (VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'x'),
                            (4, 40, 'y')) AS s(a, "f.c1", grp)
    )
    SELECT g AS grp_alias,
           CAST(SUM(x) AS BIGINT)     AS sum_x,
           CAST(SUM(y) AS BIGINT)     AS sum_y,
           CAST(SUM(x + 1) AS BIGINT) AS sum_x1,
           (SELECT x2 FROM (SELECT 1 AS x0, x0 + 1 AS x1_,
                                   x1_ * 10 AS x2)) AS lateral_chain,
           (SELECT COUNT(*) FROM (SELECT t.* FROM
                (SELECT 1 AS a, 2 AS b) t)) AS qualified_star_cnt,
           (SELECT COUNT(*) FROM (SELECT * EXCLUDE (b) FROM
                (SELECT 1 AS a, 2 AS b) t)) AS star_except_cnt
    FROM (SELECT a, "f.c1", grp FROM src) AS f(x, y, g)
    GROUP BY grp_alias
    ORDER BY grp_alias
    """,
    tags=("functions", "edge", "identifiers"),
    doc="""Name-resolution corners (reference alias.slt /
    references.slt / wildcard.slt): derived-table COLUMN-ALIAS LISTS
    `(select ...) AS f(x, y, g)` positionally rename — including a
    source column whose NAME CONTAINS A DOT (`f.c1`, quoted with
    backticks on Spark, double-quotes on DuckDB/DataFusion, and
    never resolved as table.column); output aliases are legal in
    GROUP BY and ORDER BY; LATERAL column aliases chain within one
    SELECT (x0 -> x1 -> x2); qualified wildcards t.* expand only
    that relation; and star-EXCEPT (Spark) / EXCLUDE
    (DuckDB/DataFusion dialect, translated by the in-repo compat
    layer) prunes columns at projection time so the scan never reads
    them.  All pure name-binding semantics — identical values, three
    spellings pinned.""",
)
