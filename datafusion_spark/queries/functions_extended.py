"""Extended scalar/aggregate function parity — second sweep.

Reference: datafusion/functions/src/{math,string,unicode,regex,datetime}/
families not yet covered by functions_scalar.py: hyperbolics and cbrt/
hypot/cot (math/src/trigonometry.rs), overlay/elt/find_in_set/char/conv
(string+unicode), regexp_count/regexp_substr/regexp_instr (regex/src/),
months_between/next_day/unix_date (datetime/src/), JSON struct round-trip
(DataFusion ships json via functions-json crate), count_if
(functions-aggregate/src/count.rs FILTER idiom).

DuckDB lacks some of these (sinh, overlay, months_between, find_in_set,
next_day) — the oracle emulates them with portable SQL so the check stays
independent: two implementations, one expected answer.

All expressions are JVM-side built-ins → whole-stage codegen, no shuffle
beyond the aggregate entries; scan-level column pruning applies (each
entry selects a narrow projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "fn_math_extended",
    oracle="""
    SELECT p_partkey,
           ROUND(cbrt(p_retailprice), 6) AS cbrt_price,
           ROUND(sqrt(p_retailprice * p_retailprice + p_size * p_size), 6) AS hyp,
           ROUND((exp(p_size / 50.0) - exp(-p_size / 50.0)) / 2, 6) AS sinh_v,
           ROUND((exp(p_size / 50.0) + exp(-p_size / 50.0)) / 2, 6) AS cosh_v,
           ROUND((exp(2 * p_size / 25.0) - 1) / (exp(2 * p_size / 25.0) + 1), 6)
             AS tanh_v,
           ROUND(ln(p_size + sqrt(CAST(p_size AS DOUBLE) * p_size + 1)), 6) AS asinh_v,
           ROUND(cot(1.0 + p_size), 6) AS cot_v,
           ROUND(pi() * p_size, 6) AS pi_scaled,
           ROUND(log(2, p_retailprice), 6) AS log2_price,
           isnan(CASE WHEN p_size % 5 = 0 THEN CAST('NaN' AS DOUBLE)
                      ELSE p_retailprice END) AS is_nan,
           CASE WHEN isnan(CASE WHEN p_size % 5 = 0 THEN CAST('NaN' AS DOUBLE)
                                ELSE p_retailprice END)
                THEN 0.0 ELSE p_retailprice END AS nan_cleaned
    FROM part WHERE p_partkey < 300
    """,
    tags=("functions", "math"),
)
def fn_math_extended(spark, sf_dir):
    """Hyperbolics/cbrt/hypot/cot/pi/log-base/isnan/nanvl.  DuckDB has no
    sinh/cosh/tanh/asinh → oracle uses the exp/ln identities; rounded to
    6dp to absorb libm ulp differences (§4 rule 2)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    nan_injected = F.when(
        F.col("p_size") % 5 == 0, F.lit(float("nan"))
    ).otherwise(F.col("p_retailprice"))
    return p.select(
        "p_partkey",
        F.round(F.cbrt("p_retailprice"), 6).alias("cbrt_price"),
        F.round(F.hypot(F.col("p_retailprice"), F.col("p_size")), 6).alias("hyp"),
        F.round(F.sinh(F.col("p_size") / 50.0), 6).alias("sinh_v"),
        F.round(F.cosh(F.col("p_size") / 50.0), 6).alias("cosh_v"),
        F.round(F.tanh(F.col("p_size") / 25.0), 6).alias("tanh_v"),
        F.round(F.asinh(F.col("p_size").cast("double")), 6).alias("asinh_v"),
        F.round(F.cot(F.lit(1.0) + F.col("p_size")), 6).alias("cot_v"),
        F.round(F.lit(3.141592653589793) * F.col("p_size"), 6).alias("pi_scaled"),
        F.round(F.log(2.0, F.col("p_retailprice")), 6).alias("log2_price"),
        F.isnan(nan_injected).alias("is_nan"),
        F.nanvl(nan_injected, F.lit(0.0)).alias("nan_cleaned"),
    )


@query(
    "fn_string_extended",
    oracle="""
    SELECT p_partkey,
           substr(p_name, 1, 2) || 'XX' || substr(p_name, 5) AS overlaid,
           CASE 1 + p_size % 3 WHEN 1 THEN p_brand
                               WHEN 2 THEN p_type
                               ELSE p_name END AS elt_pick,
           CAST(COALESCE(list_position(string_split('Brand#1,Brand#2,Brand#3', ','),
                                       p_brand), 0) AS INT) AS brand_slot,
           chr(65 + p_size % 26) AS letter,
           CAST(bit_length(p_name) AS INT) AS bits,
           to_base(p_partkey, 16) AS hex_key,
           CAST(CASE WHEN strpos(substr(p_name, 3), 'e') = 0 THEN 0
                     ELSE strpos(substr(p_name, 3), 'e') + 2 END AS INT) AS loc_e_from3
    FROM part WHERE p_partkey < 300
    """,
    tags=("functions", "string"),
)
def fn_string_extended(spark, sf_dir):
    """overlay / elt / find_in_set / char / bit_length / conv / 3-arg
    locate.  DuckDB lacks overlay, elt, find_in_set, conv and 3-arg
    position → the oracle emulates each with substr/CASE/list_position/
    to_base, so the check is two independent derivations."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.expr("overlay(p_name PLACING 'XX' FROM 3 FOR 2)").alias("overlaid"),
        F.expr("elt(1 + p_size % 3, p_brand, p_type, p_name)").alias("elt_pick"),
        F.expr("find_in_set(p_brand, 'Brand#1,Brand#2,Brand#3')").alias("brand_slot"),
        F.expr("char(65 + p_size % 26)").alias("letter"),
        F.expr("bit_length(p_name)").alias("bits"),
        F.expr("conv(CAST(p_partkey AS STRING), 10, 16)").alias("hex_key"),
        F.expr("locate('e', p_name, 3)").alias("loc_e_from3"),
    )


@query(
    "fn_regex_extended",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
           NULLIF(regexp_extract(text, '[a-z]{6,}'), '') AS long_word,
           CAST(CASE WHEN regexp_extract(text, 'doc[0-9]+') = '' THEN 0
                     ELSE strpos(text, regexp_extract(text, 'doc[0-9]+'))
                END AS BIGINT) AS doc_ref_pos,
           array_to_string(string_split_regex(substr(text, 1, 40), '[aeiou]'), '|')
             AS devoweled_parts
    FROM documents WHERE doc_id < 150
    """,
    tags=("functions", "regex"),
)
def fn_regex_extended(spark, sf_dir):
    """regexp_count / regexp_substr / regexp_instr / regex split-to-array.
    Oracle notes: DuckDB regexp_extract returns '' on miss (Spark
    regexp_substr → NULL) → NULLIF; regexp_instr emulated via strpos of the
    extracted match (sound because the matched substring's first occurrence
    is itself the first regex match for this self-matching pattern)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return d.select(
        "doc_id",
        F.expr("regexp_count(text, '[0-9]')").cast("long").alias("n_digits"),
        F.expr("regexp_substr(text, '[a-z]{6,}')").alias("long_word"),
        F.expr("regexp_instr(text, 'doc[0-9]+')").cast("long").alias("doc_ref_pos"),
        F.array_join(F.split(F.substring("text", 1, 40), "[aeiou]"), "|")
        .alias("devoweled_parts"),
    )


@query(
    "fn_datetime_extended",
    oracle="""
    SELECT event_id,
           ROUND((CAST(year(CAST(ts AS DATE)) AS BIGINT) - 2024) * 12
                 + (CAST(month(CAST(ts AS DATE)) AS BIGINT) - 1)
                 + CASE WHEN day(CAST(ts AS DATE)) = 15 THEN 0
                        ELSE (day(CAST(ts AS DATE)) - 15) / 31.0 END, 8)
             AS months_since,
           CAST(CAST(ts AS DATE)
                + to_days(CAST(((7 - isodow(CAST(ts AS DATE))) % 7) + 1 AS INT))
                AS DATE) AS next_monday,
           dayname(CAST(ts AS DATE)) AS day_name,
           make_timestamp((epoch_us(ts) // 1000000) * 1000000) AS ts_seconds,
           CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
             AS days_since_epoch,
           CAST(ts AS DATE) AS d_roundtrip
    FROM events WHERE event_id < 1500
    """,
    tags=("functions", "datetime"),
)
def fn_datetime_extended(spark, sf_dir):
    """months_between / next_day / dayname / timestamp_seconds / unix_date /
    date_from_unix_date.  DuckDB lacks months_between and next_day → oracle
    reimplements Spark's documented formulas (fractional part = day-diff/31,
    integer when days match; next strictly-later weekday).  Session TZ is
    UTC on both engines so epoch arithmetic lines up."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1500)
    d = F.col("ts").cast("date")
    return e.select(
        "event_id",
        F.months_between(d, F.to_date(F.lit("2024-01-15"))).alias("months_since"),
        F.next_day(d, "Mon").alias("next_monday"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts_seconds"),
        F.unix_date(d).cast("long").alias("days_since_epoch"),
        F.date_from_unix_date(F.unix_date(d)).alias("d_roundtrip"),
    )


@query(
    "fn_json_struct_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           json_extract_string(props, '$.k') AS k_str,
           to_json({'t': event_type, 'k': CAST(json_extract(props, '$.k') AS INT)})
             AS js
    FROM events WHERE event_id < 1500
    """,
    tags=("functions", "json"),
)
def fn_json_struct_roundtrip(spark, sf_dir):
    """from_json → typed struct field, get_json_object string extraction,
    and to_json re-serialization (compact, key-ordered — both engines emit
    {"t":...,"k":...} with no whitespace)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1500)
    parsed = F.from_json(F.col("props"), "k int")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_val"),
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        F.to_json(
            F.struct(
                F.col("event_type").alias("t"), parsed.getField("k").alias("k")
            )
        ).alias("js"),
    )


@query(
    "agg_count_if",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_quantity > 25) AS BIGINT) AS n_heavy,
           CAST(count_if(l_discount = 0.0) AS BIGINT) AS n_no_discount,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregates",),
)
def agg_count_if(spark, sf_dir):
    """count_if (DataFusion: COUNT(*) FILTER / count_if UDAF) — partial
    aggregation map-side, single shuffle on the group key."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_heavy"),
        F.count_if(F.col("l_discount") == 0.0).alias("n_no_discount"),
        F.count(F.lit(1)).alias("n_total"),
    )

@query(
    "fn_conditional_nvl",
    oracle="""
    SELECT event_id,
           ifnull(NULLIF(event_type, 'error'), 'n/a') AS type_or_na,
           CASE WHEN NULLIF(event_type, 'error') IS NOT NULL
                THEN value ELSE -1.0 END AS nvl2_value,
           COALESCE(NULLIF(event_type, 'error'), NULLIF(event_type, 'click'),
                    'both') AS first_non_null
    FROM events WHERE event_id < 1500
    """,
    tags=("functions", "conditional"),
)
def fn_conditional_nvl(spark, sf_dir):
    """nvl / nvl2 / multi-arg coalesce (reference: functions/src/core/
    {nvl,nvl2,coalesce}.rs).  DuckDB has ifnull but no nvl2 → CASE
    emulation."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1500)
    nulled = F.nullif(F.col("event_type"), F.lit("error"))
    return e.select(
        "event_id",
        F.nvl(nulled, F.lit("n/a")).alias("type_or_na"),
        F.nvl2(nulled, F.col("value"), F.lit(-1.0)).alias("nvl2_value"),
        F.coalesce(
            nulled, F.nullif(F.col("event_type"), F.lit("click")), F.lit("both")
        ).alias("first_non_null"),
    )


@query(
    "fn_math_gcd_lcm",
    oracle="""
    SELECT p_partkey,
           gcd(p_partkey + 1, p_size) AS g,
           lcm(p_size, 6) AS l,
           (p_retailprice - p_retailprice) = 0.0 AS zero_check
    FROM part WHERE p_partkey < 300
    """,
    tags=("functions", "math"),
)
def fn_math_gcd_lcm(spark, sf_dir):
    """gcd / lcm / iszero (reference: functions/src/math/{gcd,lcm,
    iszero}.rs).  Spark has no gcd builtin — implemented as a BOUNDED
    EUCLID FOLD entirely JVM-side: fold 92 Euclid steps over a constant
    sequence with aggregate(); Euclid needs ~log_phi(min(a,b)) steps
    (worst case consecutive Fibonaccis), so 92 covers any 64-bit pair.
    No UDF, stays in codegen; converged pairs hit the b=0 no-op branch.
    lcm(a,b) = a*b / gcd(a,b)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)

    def gcd_fold(a, b):
        pair = F.struct(a.cast("long").alias("a"), b.cast("long").alias("b"))
        out = F.aggregate(
            F.sequence(F.lit(1), F.lit(92)),
            pair,
            lambda acc, _: F.when(
                acc.getField("b") == 0, acc
            ).otherwise(
                F.struct(
                    acc.getField("b").alias("a"),
                    (acc.getField("a") % acc.getField("b")).alias("b"),
                )
            ),
        )
        return out.getField("a")

    g = gcd_fold(F.col("p_partkey") + 1, F.col("p_size"))
    lcm = (F.col("p_size").cast("long") * 6 / gcd_fold(F.col("p_size"), F.lit(6))).cast(
        "long"
    )
    return p.select(
        "p_partkey",
        g.alias("g"),
        lcm.alias("l"),
        ((F.col("p_retailprice") - F.col("p_retailprice")) == 0.0).alias("zero_check"),
    )


@query(
    "fn_timezone_convert",
    oracle="""
    SELECT event_id,
           CAST(timezone('America/New_York', timezone('UTC', ts)) AS TIMESTAMP)
             AS ny_wall,
           CAST(timezone('Asia/Tokyo', timezone('UTC', ts)) AS TIMESTAMP)
             AS tokyo_wall,
           CAST(timezone('UTC', timezone('America/New_York',
                CAST(timezone('America/New_York', timezone('UTC', ts))
                     AS TIMESTAMP))) AS TIMESTAMP) AS utc_roundtrip
    FROM events WHERE event_id < 1500
    """,
    tags=("functions", "datetime", "timezone"),
)
def fn_timezone_convert(spark, sf_dir):
    """from_utc_timestamp / to_utc_timestamp (reference: functions/src/
    datetime/to_local_time.rs).  Both engines use the IANA tzdb, so wall
    clocks agree across DST transitions; round-trip back to UTC is the
    inverse check."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1500)
    ny = F.from_utc_timestamp("ts", "America/New_York")
    return e.select(
        "event_id",
        ny.alias("ny_wall"),
        F.from_utc_timestamp("ts", "Asia/Tokyo").alias("tokyo_wall"),
        F.to_utc_timestamp(ny, "America/New_York").alias("utc_roundtrip"),
    )

@query(
    "fn_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           COALESCE(array_to_string(regexp_extract_all(text, '[a-z]{6,}'), '|'), '')
             AS long_words,
           COALESCE(array_to_string(regexp_extract_all(text, '([0-9]+)'), '|'), '')
             AS numbers
    FROM documents WHERE doc_id < 150
    """,
    tags=("functions", "regex"),
)
def fn_regexp_extract_all(spark, sf_dir):
    """regexp_extract_all — every match, not just the first (reference:
    functions/src/regex/regexpmatch.rs).  Joined to a string for the
    order-sensitive hash (match order is positional in both engines)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return d.select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all("text", F.lit("([a-z]{6,})"), 0), "|"
        ).alias("long_words"),
        F.array_join(F.regexp_extract_all("text", F.lit("([0-9]+)"), 1), "|")
        .alias("numbers"),
    )


@query(
    "agg_nth_value_ordered",
    oracle="""
    SELECT event_type,
           (list_sort(list(event_id)))[3] AS third_lowest_id,
           (list_sort(list(event_id), 'DESC'))[2] AS second_highest_id,
           (list_sort(list(event_id)))[1] AS first_id
    FROM events GROUP BY event_type
    """,
    tags=("aggregates", "nth"),
)
def agg_nth_value_ordered(spark, sf_dir):
    """nth_value as an ORDERED AGGREGATE (reference: functions-aggregate/
    src/nth_value.rs — NTH_VALUE(x ORDER BY y)).  Spark has no nth
    aggregate → collect_list + array_sort + element_at, which is exactly
    DataFusion's accumulator (ordered buffer, emit slot n).  Bounded per
    group by the collect; for unbounded groups use the window nth_value
    (window_first_last_nth) instead."""
    e = _t(spark, sf_dir, "events")
    ids = F.array_sort(F.collect_list("event_id"))
    return e.groupBy("event_type").agg(
        F.element_at(ids, 3).alias("third_lowest_id"),
        F.element_at(F.reverse(ids), 2).alias("second_highest_id"),
        F.element_at(ids, 1).alias("first_id"),
    )


@query(
    "fn_variant_semistructured",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             '{"id":' || doc_id || ',"lang":"' || lang || '","n":' || n_chars
               || ',"tags":["' || source || '","corpus"]}' AS js
      FROM documents WHERE doc_id < 400
    )
    SELECT doc_id,
           json_extract_string(js, '$.lang') AS lang_v,
           CAST(json_extract(js, '$.n') AS BIGINT) AS n_v,
           json_extract_string(js, '$.tags[0]') AS tag0,
           CAST(json_extract(js, '$.missing') IS NULL AS BOOLEAN) AS missing_is_null
    FROM src
    """,
    tags=("functions", "variant", "json"),
)
def fn_variant_semistructured(spark, sf_dir):
    """Semi-structured VARIANT type: parse once, extract typed fields with
    path expressions (reference: DataFusion serves this via functions-json;
    Spark 4's native VARIANT is the engine-level answer — a binary-encoded
    document type whose paths are evaluated without re-parsing).  Scale:
    parse_json runs once per row at scan time; extraction is JVM-side
    byte-offset navigation, ~10x cheaper than repeated get_json_object
    string parses."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    js = F.concat(
        F.lit('{"id":'), F.col("doc_id").cast("string"),
        F.lit(',"lang":"'), F.col("lang"),
        F.lit('","n":'), F.col("n_chars").cast("string"),
        F.lit(',"tags":["'), F.col("source"), F.lit('","corpus"]}'),
    )
    return d.withColumn("js", js).select(
        "doc_id",
        F.expr("variant_get(parse_json(js), '$.lang', 'string')").alias("lang_v"),
        F.expr("variant_get(parse_json(js), '$.n', 'bigint')").alias("n_v"),
        F.expr("variant_get(parse_json(js), '$.tags[0]', 'string')").alias("tag0"),
        F.expr("variant_get(parse_json(js), '$.missing', 'string') IS NULL")
        .alias("missing_is_null"),
    )


@query(
    "fn_bitwise_family",
    oracle="""
    SELECT e_int AS event_id,
           e_int & 255 AS band,
           e_int | 4096 AS bor,
           xor(e_int, 1365) AS bxor,
           ~e_int AS bnot,
           CAST(bit_count(e_int) AS INTEGER) AS popcount,
           e_int << 2 AS shl,
           e_int >> 3 AS shr
    FROM (SELECT CAST(event_id AS BIGINT) AS e_int FROM events WHERE event_id < 2000)
    """,
    tags=("functions", "bitwise"),
)
def fn_bitwise_family(spark, sf_dir):
    """Bitwise operator family (reference: datafusion/expr BinaryExpr
    BitwiseAnd/Or/Xor/ShiftLeft/ShiftRight + functions/src/math bit
    helpers).  All JVM integer ops inside codegen; popcount via
    bit_count."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    x = F.col("event_id").cast("long")
    return e.select(
        x.alias("event_id"),
        x.bitwiseAND(F.lit(255)).alias("band"),
        x.bitwiseOR(F.lit(4096)).alias("bor"),
        x.bitwiseXOR(F.lit(1365)).alias("bxor"),
        F.expr("~CAST(event_id AS BIGINT)").alias("bnot"),
        F.bit_count(x).alias("popcount"),
        F.shiftleft(x, 2).alias("shl"),
        F.shiftright(x, 3).alias("shr"),
    )


@query(
    "fn_timestamp_precision",
    oracle="""
    SELECT o_orderkey,
           epoch_ms(o_orderdate) AS ms,
           epoch_us(o_orderdate) AS us,
           epoch_ms(epoch_ms(o_orderdate)) AS ts_from_ms,
           make_timestamp(epoch_us(o_orderdate) + 123456) AS ts_plus_us
    FROM orders WHERE o_orderkey < 3000
    """,
    tags=("functions", "datetime", "precision"),
)
def fn_timestamp_precision(spark, sf_dir):
    """Epoch↔timestamp at millisecond/microsecond precision (reference:
    functions/src/datetime/{to_timestamp,from_unixtime}.rs micros/millis
    variants).  Round-trips prove no precision loss through the int64
    epoch representation."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    ts = F.col("o_orderdate").cast("timestamp")  # NTZ → UTC instant (session tz)
    return o.select(
        "o_orderkey",
        F.unix_millis(ts).alias("ms"),
        F.unix_micros(ts).alias("us"),
        F.timestamp_millis(F.unix_millis(ts)).alias("ts_from_ms"),
        F.timestamp_micros(F.unix_micros(ts) + 123456).alias("ts_plus_us"),
    )


@query(
    "fn_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE ROUND(o_totalprice / (o_orderkey % 7), 6) END AS safe_div,
           CASE WHEN o_orderkey > 9223372036854775807 // 1125899906842624
                THEN NULL ELSE o_orderkey * 1125899906842624 END AS safe_mul,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_orderkey // (o_orderkey % 7) END AS safe_intdiv
    FROM orders WHERE o_orderkey < 30000
    """,
    tags=("functions", "try-arithmetic", "ansi"),
)
def fn_try_arithmetic(spark, sf_dir):
    """try_* arithmetic — NULL instead of error on /0 and int64 overflow
    (reference: DataFusion's non-ANSI kernels return NULL the same way;
    Spark's ANSI mode pairs every operator with a try_ twin).  The
    oracle spells out the guard conditions by hand, proving the NULL
    semantics rather than restating them."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 30000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice"), k % 7), 6).alias("safe_div"),
        F.try_multiply(k, F.lit(1125899906842624).cast("long")).alias("safe_mul"),
        F.try_divide(k, k % 7).cast("long").alias("safe_intdiv"),
    )


@query(
    "fn_number_format_group_by_all",
    oracle="""
    SELECT o_orderpriority,
           format('{:,}', CAST(floor(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)) AS BIGINT))
             || '.' || substr(CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) % 1, 2) + 1.001 AS VARCHAR), 3, 2)
             AS total_pretty,
           printf('%05d', COUNT(*)) AS n_padded,
           COUNT(*) AS n
    FROM orders
    GROUP BY ALL
    """,
    tags=("functions", "format", "group-by-all"),
)
def fn_number_format_group_by_all(spark, sf_dir):
    """format_number / printf-style rendering + GROUP BY ALL (both
    engines infer the grouping keys from the non-aggregate select list —
    DataFusion supports the same shorthand).  Formatting happens AFTER
    the decimal-exact sum, so the pretty string is deterministic."""
    from datafusion_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               format_number(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2)
                 AS total_pretty,
               format_string('%05d', COUNT(*)) AS n_padded,
               COUNT(*) AS n
        FROM orders
        GROUP BY ALL
        """
    )


@query(
    "fn_json_tuple_keys",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS VARCHAR) AS k_str,
           CAST(NULL AS VARCHAR) AS z_str,
           array_to_string(json_keys(props), ',') AS key_list
    FROM events
    WHERE event_id < 500
    """,
    tags=("json", "spark-compat", "generator"),
)
def fn_json_tuple_keys(spark, sf_dir):
    """json_tuple (multi-field generator) + json_object_keys (reference:
    test_files/spark/json/{json_tuple,json_object_keys}.slt).
    json_tuple extracts several fields in ONE parse of the document —
    the per-row cost at 100 TB is parse-bound, so fusing k extractions
    into one parse beats k get_json_object calls k-fold.  A missing key
    ('z') yields NULL; json_object_keys returns the key array (joined
    to a string for the comparator)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.expr("json_tuple(props, 'k', 'z')").alias("k_str", "z_str"),
        F.array_join(F.expr("json_object_keys(props)"), ",").alias("key_list"),
    )


@query(
    "fn_interval_constructors",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + to_months(14) AS plus_ym,
           o_orderdate + to_months(1) AS add_months_1,
           CAST(CAST(o_orderdate AS TIMESTAMP)
                + to_days(3) + to_hours(5) + to_minutes(30) + to_seconds(45)
                AS TIMESTAMP) AS plus_dt,
           CAST(CAST(o_orderdate AS TIMESTAMP)
                + to_years(1) + to_months(2) + to_days(10) + to_hours(12)
                AS TIMESTAMP) AS plus_mixed,
           strftime(o_orderdate, '%b') AS mon_name
    FROM orders
    WHERE o_orderkey < 2000
    """,
    tags=("datetime", "interval", "spark-compat"),
)
def fn_interval_constructors(spark, sf_dir):
    """Interval constructor functions (reference: test_files/spark/
    datetime/{make_interval,make_dt_interval,make_ym_interval,
    add_months,monthname}.slt).  make_ym_interval → year-month interval
    (calendar-aware, month-end clamped), make_dt_interval → exact
    day-time interval, make_interval → mixed; all applied to the same
    date on both engines.  Codegen-side expressions, no shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.expr("o_orderdate + make_ym_interval(1, 2)").alias("plus_ym"),
        F.expr("add_months(o_orderdate, 1)").alias("add_months_1"),
        F.expr(
            "cast(o_orderdate as timestamp) + make_dt_interval(3, 5, 30, 45)"
        ).alias("plus_dt"),
        F.expr(
            "cast(o_orderdate as timestamp) + make_interval(1, 2, 0, 10, 12, 0, 0)"
        ).alias("plus_mixed"),
        F.expr("monthname(o_orderdate)").alias("mon_name"),
    )


@query(
    "fn_datetime_misc_parity",
    oracle="""
    SELECT o_orderkey,
           CAST(date_part('year', o_orderdate) AS BIGINT) AS y,
           strftime(o_orderdate, '%Y-%m') AS ym,
           split_part(CAST(o_orderkey AS STRING) || '#tail#x', '#', 1) AS head_tok,
           (epoch_ms(o_orderdate) // 1000) AS unix_s,
           regexp_matches(CAST(uuid() AS STRING),
             '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$')
             AS uuid_ok,
           current_date >= DATE '2026-01-01' AS today_ok
    FROM orders WHERE o_orderkey < 100
    """,
    tags=("functions", "datetime", "misc"),
)
def fn_datetime_misc_parity(spark, sf_dir):
    """Parity stragglers from reference functions/src/{datetime,string,core}:
    date_part, to_char (→ date_format / strftime), substr_index
    (→ substring_index / split_part), to_unixtime (→ unix_timestamp /
    epoch), uuid (format-checked — the value is nondeterministic by
    definition, so the oracle compares the RFC-4122 shape), and a
    current_date sanity predicate (both engines evaluate on the same day).
    All scan-side projections; no shuffle."""
    from datafusion_spark.catalog import load_table as _lt

    o = _lt(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.expr("date_part('year', o_orderdate)").cast("long").alias("y"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.substring_index(
            F.concat(F.col("o_orderkey").cast("string"), F.lit("#tail#x")), "#", 1
        ).alias("head_tok"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("unix_s"),
        F.expr(
            "uuid() rlike '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$'"
        ).alias("uuid_ok"),
        (F.current_date() >= F.lit("2026-01-01").cast("date")).alias("today_ok"),
    )
