"""Scalar function library parity.

Reference: datafusion/functions/src/{string,unicode,regex,crypto,math,
datetime,core}/ — DataFusion ships ~200 scalar functions; Spark's
pyspark.sql.functions covers the same surface JVM-side (whole-stage
codegen, no Python in the hot path).  Each entry below exercises a family
of functions as computed columns so the oracle hash checks exact scalar
semantics, not just plumbing.

Cross-engine notes (Spark vs DuckDB) encoded here:
  - transcendentals (exp/ln/sin/...) can differ in the last ULP between
    libm implementations → results rounded to 4-6 decimals on both sides
  - weekday: Spark weekday() is 0=Monday; DuckDB isodow is 1=Monday
  - int widths: Spark year()/month() return INT, DuckDB BIGINT → cast
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "fn_string_basic",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS up, LOWER(p_brand) AS lo,
           CAST(LENGTH(p_name) AS BIGINT) AS len,
           SUBSTR(p_name, 1, 4) AS sub4,
           CONCAT_WS('-', p_brand, p_type) AS joined,
           LPAD(p_brand, 12, '.') AS lp, RPAD(p_type, 10, '_') AS rp,
           TRIM('  ' || p_type || ' ') AS trimmed,
           REPLACE(p_name, ' ', '_') AS repl,
           REVERSE(p_type) AS rev,
           REPEAT(p_brand, 2) AS rep2,
           LEFT(p_name, 3) AS l3, RIGHT(p_name, 3) AS r3,
           SPLIT_PART(p_name, ' ', 1) AS first_word,
           CAST(STRPOS(p_name, 'e') AS BIGINT) AS pos_e,
           CAST(ASCII(p_brand) AS BIGINT) AS ascii_first
    FROM part WHERE p_partkey < 200
    """,
    tags=("functions", "string"),
)
def fn_string_basic(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").cast("long").alias("len"),
        F.substring("p_name", 1, 4).alias("sub4"),
        F.concat_ws("-", "p_brand", "p_type").alias("joined"),
        F.lpad("p_brand", 12, ".").alias("lp"),
        F.rpad("p_type", 10, "_").alias("rp"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("repl"),
        F.reverse("p_type").alias("rev"),
        F.repeat("p_brand", 2).alias("rep2"),
        F.substring("p_name", 1, 3).alias("l3"),
        F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias("r3"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.instr(F.col("p_name"), "e").cast("long").alias("pos_e"),
        F.ascii("p_brand").cast("long").alias("ascii_first"),
    )


@query(
    "fn_string_regex",
    oracle="""
    SELECT doc_id,
           REGEXP_EXTRACT(text, '([a-z]+)', 1) AS first_token,
           REGEXP_REPLACE(SUBSTR(text, 1, 30), '[aeiou]', '*', 'g') AS devoweled,
           REGEXP_MATCHES(text, 'hash') AS mentions_hash,
           CAST(LENGTH(REGEXP_REPLACE(SUBSTR(text, 1, 50), '[^ ]', '', 'g')) AS BIGINT)
             AS n_spaces_first50
    FROM documents WHERE doc_id < 100
    """,
    tags=("functions", "regex"),
)
def fn_string_regex(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_token"),
        F.regexp_replace(F.substring("text", 1, 30), r"[aeiou]", "*").alias("devoweled"),
        F.col("text").rlike("hash").alias("mentions_hash"),
        F.length(F.regexp_replace(F.substring("text", 1, 50), r"[^ ]", "")).cast("long")
        .alias("n_spaces_first50"),
    )


@query(
    "fn_string_crypto",
    oracle="""
    SELECT doc_id, MD5(text) AS md5_hex, SHA256(text) AS sha256_hex
    FROM documents WHERE doc_id < 100
    """,
    tags=("functions", "crypto"),
)
def fn_string_crypto(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
    )


@query(
    "fn_math_double",
    oracle="""
    SELECT p_partkey,
           ROUND(SQRT(p_retailprice), 4) AS sq,
           ROUND(LN(p_retailprice), 4) AS lnv,
           ROUND(LOG10(p_retailprice), 4) AS log10v,
           ROUND(LOG2(p_retailprice), 4) AS log2v,
           ROUND(EXP(CAST(p_size AS DOUBLE) / 25.0), 4) AS expv,
           ROUND(POWER(p_retailprice, 0.5) + POWER(CAST(p_size AS DOUBLE), 2), 4) AS pw,
           ROUND(SIN(p_retailprice) + COS(p_retailprice), 4) AS trig,
           ROUND(ATAN2(CAST(p_size AS DOUBLE), 10.0), 4) AS at2,
           ROUND(DEGREES(1.0) + RADIANS(CAST(p_size AS DOUBLE)), 4) AS degrad,
           CAST(CEIL(p_retailprice) AS BIGINT) AS ce, CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
           ROUND(p_retailprice, 1) AS rnd1,
           ABS(CAST(p_size AS DOUBLE) - 25.0) AS absd,
           CAST(SIGN(CAST(p_size AS DOUBLE) - 25.0) AS DOUBLE) AS sgn
    FROM part WHERE p_partkey < 200
    """,
    tags=("functions", "math"),
)
def fn_math_double(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    size_d = F.col("p_size").cast("double")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(F.sqrt(price), 4).alias("sq"),
        F.round(F.log(price), 4).alias("lnv"),
        F.round(F.log10(price), 4).alias("log10v"),
        F.round(F.log2(price), 4).alias("log2v"),
        F.round(F.exp(size_d / 25.0), 4).alias("expv"),
        F.round(F.pow(price, 0.5) + F.pow(size_d, 2), 4).alias("pw"),
        F.round(F.sin(price) + F.cos(price), 4).alias("trig"),
        F.round(F.atan2(size_d, F.lit(10.0)), 4).alias("at2"),
        F.round(F.degrees(F.lit(1.0)) + F.radians(size_d), 4).alias("degrad"),
        F.ceil(price).alias("ce"),
        F.floor(price).alias("fl"),
        F.round(price, 1).alias("rnd1"),
        F.abs(size_d - 25.0).alias("absd"),
        F.signum(size_d - 25.0).alias("sgn"),
    )


@query(
    "fn_math_int",
    oracle="""
    SELECT p_partkey,
           ABS(p_size - 25) AS absz,
           p_size % 7 AS mod7,
           CAST(p_size AS BIGINT) << 2 AS shl,
           CAST(p_size AS BIGINT) >> 1 AS shr,
           CAST(FACTORIAL(CAST(LEAST(p_size % 6, 5) AS INTEGER)) AS BIGINT) AS factv,
           CAST(GREATEST(p_size, 25) AS BIGINT) AS gr, CAST(LEAST(p_size, 25) AS BIGINT) AS le
    FROM part WHERE p_partkey < 200
    """,
    tags=("functions", "math"),
)
def fn_math_int(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        F.abs(sz - 25).alias("absz"),
        (sz % 7).alias("mod7"),
        F.shiftleft(sz.cast("long"), 2).alias("shl"),
        F.shiftright(sz.cast("long"), 1).alias("shr"),
        F.factorial(F.least(sz % 6, F.lit(5))).cast("long").alias("factv"),
        F.greatest(sz, F.lit(25)).cast("long").alias("gr"),
        F.least(sz, F.lit(25)).cast("long").alias("le"),
    )


@query(
    "fn_datetime_parts",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS mo,
           CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
           CAST(minute(ts) AS INT) AS mi, CAST(second(ts) AS INT) AS s,
           CAST(quarter(ts) AS INT) AS q,
           CAST(weekofyear(ts) AS INT) AS iso_week,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(isodow(ts) - 1 AS INT) AS weekday_mon0
    FROM events WHERE event_id < 500
    """,
    tags=("functions", "datetime"),
)
def fn_datetime_parts(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        F.quarter("ts").alias("q"),
        F.weekofyear("ts").alias("iso_week"),
        F.dayofyear("ts").alias("doy"),
        F.weekday("ts").alias("weekday_mon0"),
    )


@query(
    "fn_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
             AS days_since_epoch_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(o_orderdate AS DATE) - 7 AS week_before
    FROM orders WHERE o_orderkey < 300
    """,
    tags=("functions", "datetime"),
)
def fn_datetime_arith(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.date_sub(F.col("o_orderdate").cast("date"), 7).alias("week_before"),
    )


@query(
    "fn_datetime_format",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M') AS fmt,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
           make_date(2024, CAST(month(ts) AS INT), 1) AS first_of_month,
           CAST(ts AS DATE) AS d
    FROM events WHERE event_id < 300
    """,
    tags=("functions", "datetime"),
)
def fn_datetime_format(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("fmt"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.make_date(F.lit(2024), F.month("ts"), F.lit(1)).alias("first_of_month"),
        F.col("ts").cast("date").alias("d"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT s_suppkey,
           COALESCE(NULLIF(s_name, 'Supplier#000000001'), 'REDACTED') AS masked,
           NULLIF(s_acctbal, 73.00) AS bal_or_null,
           GREATEST(s_acctbal, 0.0) AS pos_bal,
           LEAST(s_acctbal, 1000.0) AS capped,
           (s_acctbal IS NULL) AS bal_is_null,
           (NULLIF(s_acctbal, 73.00) IS NOT NULL) AS bal_not_null,
           CASE WHEN s_acctbal < 0 THEN 'debt' ELSE 'credit' END AS standing
    FROM supplier
    """,
    tags=("functions", "conditional"),
)
def fn_conditional(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    bal_or_null = F.nullif(F.col("s_acctbal"), F.lit(73.00))
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_name"), F.lit("Supplier#000000001")), F.lit("REDACTED"))
        .alias("masked"),
        bal_or_null.alias("bal_or_null"),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("pos_bal"),
        F.least(F.col("s_acctbal"), F.lit(1000.0)).alias("capped"),
        F.isnull("s_acctbal").alias("bal_is_null"),
        bal_or_null.isNotNull().alias("bal_not_null"),
        F.when(F.col("s_acctbal") < 0, "debt").otherwise("credit").alias("standing"),
    )


@query(
    "fn_cast_conversions",
    oracle="""
    SELECT c_custkey,
           CAST(SUBSTR(c_name, 10) AS BIGINT) AS key_from_name,
           CAST(c_nationkey AS DOUBLE) AS nk_double,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS bal_str,
           CAST(c_custkey AS VARCHAR) AS key_str,
           CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor_int
    FROM customer WHERE c_custkey < 300
    """,
    tags=("functions", "cast"),
)
def fn_cast_conversions(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.substring("c_name", 10, 100).cast("long").alias("key_from_name"),
        F.col("c_nationkey").cast("double").alias("nk_double"),
        F.col("c_acctbal").cast("decimal(12,2)").cast("string").alias("bal_str"),
        F.col("c_custkey").cast("string").alias("key_str"),
        F.floor("c_acctbal").alias("bal_floor_int"),
    )


@query(
    "fn_datetime_bin",
    oracle="""
    SELECT event_id,
           time_bucket(INTERVAL '15 minutes', ts) AS bin15m,
           time_bucket(INTERVAL '90 minutes', ts) AS bin90m,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_trunc
    FROM events WHERE event_id < 500
    """,
    tags=("functions", "datetime"),
)
def fn_datetime_bin(spark, sf_dir):
    """date_bin parity (reference: datafusion/functions/src/datetime/
    date_bin.rs, sqllogictest date_bin_errors.slt for the rejected
    zero/negative strides): arbitrary-interval bucketing ⇔ Spark window().start /
    DuckDB time_bucket.  Both engines' default origins are midnight-aligned
    for sub-day intervals, so buckets coincide."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)

    def bin_secs(secs: int):
        # floor-to-interval arithmetic (Spark allows only one window() per
        # plan); unix epoch is midnight-aligned so this equals time_bucket
        return F.timestamp_seconds(
            F.floor(F.unix_timestamp("ts") / secs).cast("long") * secs
        )

    return e.select(
        "event_id",
        bin_secs(15 * 60).alias("bin15m"),
        bin_secs(90 * 60).alias("bin90m"),
        F.date_trunc("hour", "ts").alias("hour_trunc"),
    )


@query(
    "fn_string_predicates",
    oracle="""
    SELECT p_partkey,
           starts_with(p_name, 'a') AS sw,
           ends_with(p_type, 'D') AS ew,
           contains(p_name, 'qu') AS ct,
           trim(p_brand, 'B#') AS btrimmed,
           ltrim(p_brand, 'B') AS ltrimmed,
           rtrim(p_type, 'DE') AS rtrimmed
    FROM part WHERE p_partkey < 300
    """,
    tags=("functions", "string"),
)
def fn_string_predicates(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.startswith(F.col("p_name"), F.lit("a")).alias("sw"),
        F.endswith(F.col("p_type"), F.lit("D")).alias("ew"),
        F.contains(F.col("p_name"), F.lit("qu")).alias("ct"),
        F.btrim(F.col("p_brand"), F.lit("B#")).alias("btrimmed"),
        F.expr("TRIM(LEADING 'B' FROM p_brand)").alias("ltrimmed"),
        F.expr("TRIM(TRAILING 'DE' FROM p_type)").alias("rtrimmed"),
    )


@query(
    "fn_try_cast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(lang AS INTEGER) AS lang_as_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INTEGER) AS chars_roundtrip,
           TRY_CAST(source AS DOUBLE) AS source_as_double,
           TRY_CAST(CAST(doc_id AS VARCHAR) || 'x' AS BIGINT) AS bad_suffix
    FROM documents WHERE doc_id < 300
    """,
    tags=("functions", "cast"),
)
def fn_try_cast(spark, sf_dir):
    """Failable casts return NULL instead of erroring (reference:
    DataFusion's arrow_cast with safe=true; sqllogictest cast.slt)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id",
        F.try_to_number(F.col("lang"), F.lit("999")).cast("int").alias("lang_as_int"),
        F.col("n_chars").cast("string").try_cast("int").alias("chars_roundtrip"),
        F.col("source").try_cast("double").alias("source_as_double"),
        F.concat(F.col("doc_id").cast("string"), F.lit("x"))
        .try_cast("long")
        .alias("bad_suffix"),
    )


@query(
    "fn_interval_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 1 MONTH AS plus_1mo,
           o_orderdate + INTERVAL '1 month 15 days' AS plus_mixed,
           o_orderdate - INTERVAL 90 MINUTE AS minus_90min,
           o_orderdate + INTERVAL 1 YEAR + INTERVAL 1 DAY AS plus_1y1d,
           CAST(o_orderdate + INTERVAL 1 MONTH >= TIMESTAMP '1995-01-01' AS BOOLEAN)
             AS in_range
    FROM orders WHERE o_orderkey < 400
    """,
    tags=("functions", "datetime", "interval"),
)
def fn_interval_arith(spark, sf_dir):
    """Interval arithmetic incl. mixed units and month-end clamping (both
    engines clamp Jan 31 + 1 month to Feb 28) — reference:
    datafusion/functions/src/datetime/ + arrow interval kernels."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (d + F.expr("INTERVAL 1 MONTH")).alias("plus_1mo"),
        (d + F.expr("INTERVAL 1 MONTH") + F.expr("INTERVAL 15 DAY")).alias("plus_mixed"),
        (d - F.expr("INTERVAL 90 MINUTE")).alias("minus_90min"),
        (d + F.expr("INTERVAL 1 YEAR") + F.expr("INTERVAL 1 DAY")).alias("plus_1y1d"),
        ((d + F.expr("INTERVAL 1 MONTH")) >= F.lit("1995-01-01").cast("timestamp"))
        .alias("in_range"),
    )
