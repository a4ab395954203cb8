"""Spark-compat function families from the reference's datafusion-spark
crate (sqllogictest/test_files/spark/{url,hash,misc,bitmap}/).

The reference ships a whole crate re-implementing Spark's function
semantics (datafusion-spark); here the engine IS Spark, so the entries
exercise the native built-ins and the oracle re-derives the expected
answer with portable DuckDB SQL:

- url family (test_files/spark/url/parse_url.slt, url_encode.slt,
  url_decode.slt): DuckDB has no URL functions — the oracle reconstructs
  the expected pieces from the same columns (parse) or a replace-chain
  percent-encoder over the restricted input charset (encode/decode).
- hash family (test_files/spark/hash/{sha1,sha2,crc32}.slt): DuckDB has
  sha256/md5 but no sha1/crc32 — those two are checked against a
  precomputed VALUES map over the fixed 25-row nation dimension (the
  expected answers, computed once with hashlib/zlib).
- misc (test_files/spark/misc/{equal_null,typeof}.slt): equal_null ⇔
  IS NOT DISTINCT FROM; typeof names are lowercased on both sides and
  restricted to types the engines spell identically.
- bitmap family (test_files/spark/bitmap/): distinct counting via
  fixed-width bitmap buckets — the 100 TB-relevant pattern (mergeable
  exact-distinct without a count-distinct shuffle of raw keys).

All scalar entries are JVM-side built-ins inside whole-stage codegen;
the bitmap entry does one partial-aggregated shuffle on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "fn_url_parse",
    oracle="""
    SELECT n_nationkey,
           'https' AS proto,
           'example.com' AS host,
           '/catalog/' || lower(n_name) AS path,
           'id=' || n_nationkey || '&r=' || n_regionkey AS qs,
           CAST(n_regionkey AS VARCHAR) AS r_param,
           'sec' || n_nationkey AS fragment
    FROM nation
    """,
    tags=("functions", "url", "spark-compat"),
)
def fn_url_parse(spark, sf_dir):
    """parse_url PROTOCOL/HOST/PATH/QUERY/QUERY-key/REF (reference:
    datafusion/sqllogictest/test_files/spark/url/parse_url.slt).  The URL
    is built from nation columns so every row differs; the oracle builds
    the expected pieces directly from the same columns."""
    n = _t(spark, sf_dir, "nation")
    url = F.concat(
        F.lit("https://example.com/catalog/"),
        F.lower("n_name"),
        F.lit("?id="),
        F.col("n_nationkey").cast("string"),
        F.lit("&r="),
        F.col("n_regionkey").cast("string"),
        F.lit("#sec"),
        F.col("n_nationkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("qs"),
        F.parse_url(url, F.lit("QUERY"), F.lit("r")).alias("r_param"),
        F.parse_url(url, F.lit("REF")).alias("fragment"),
    )


@query(
    "fn_url_encode_decode",
    oracle="""
    SELECT n_nationkey,
           replace(replace(replace(replace(
               'q=' || n_name || ' path/x:y', '=', '%3D'),
               ' ', '+'), '/', '%2F'), ':', '%3A') AS encoded,
           'q=' || n_name || ' path/x:y' AS roundtrip
    FROM nation
    """,
    tags=("functions", "url", "spark-compat"),
)
def fn_url_encode_decode(spark, sf_dir):
    """url_encode/url_decode round-trip (reference: test_files/spark/url/
    url_encode.slt, url_decode.slt — java.net.URLEncoder semantics:
    space→'+', reserved chars → %XX).  Input charset is restricted to
    [A-Z0-9_ =/:] so the oracle's replace-chain encoder is total."""
    n = _t(spark, sf_dir, "nation")
    raw = F.concat(F.lit("q="), F.col("n_name"), F.lit(" path/x:y"))
    return n.select(
        "n_nationkey",
        F.url_encode(raw).alias("encoded"),
        F.url_decode(F.url_encode(raw)).alias("roundtrip"),
    )


_SHA_CRC_VALUES = """VALUES
    ('NATION_0', '1a90e65cfdf74f01f73e0898c48e42a23146d93f', 3678181428),
    ('NATION_1', '84b53a4ba1b4da60205db37bbf2cf226a1caa7fa', 2889590946),
    ('NATION_2', '6376bb52f51a7fb0d214d6ac32e162a4911ea79c', 892533016),
    ('NATION_3', '6b8582de89c84e237171dd66fe7daf1ab8bb683b', 1110821262),
    ('NATION_4', '35e00a9de3ea0e0b76fdfd9e91276510e7055140', 3696319533),
    ('NATION_5', '0e940890e978abc08fc652f12aaae83540230da9', 2874567867),
    ('NATION_6', 'ba7e94ea75dbe30b99b6b36076e8ffef3ebddef2', 845102337),
    ('NATION_7', '48d48664b5b6fc2acb4446e2d5db0fe7816b10a0', 1163398551),
    ('NATION_8', '28d93f603990ba38349c0479b4e52b86ed3ca1db', 3588689926),
    ('NATION_9', 'ebeff2be216d7bc2081c20bf681bf02d9afdbfa1', 2732597392),
    ('NATION_10', 'efee0918f19590574f687e56d92db60398048629', 3434030669),
    ('NATION_11', '0af3b8823e012a3f71b2f4257094c4829e74cdbb', 3148355291),
    ('NATION_12', 'a00860cf2fe35c6f3ef469578b0c006ecd09a429', 580994913),
    ('NATION_13', 'c13434ff68e3d89801a44ffd4dcb3f302ace4a31', 1436973047),
    ('NATION_14', 'f9e5b01802658cab1db3e001c6672a3c6d0a8ed7', 3418546772),
    ('NATION_15', '5aeed18f44ff9de7e6570f6626a62ef6dc3597bb', 3167081154),
    ('NATION_16', '0ce789a799dcc43aa9829346a94c87177b99f590', 634159992),
    ('NATION_17', '788adb82d6ff2e45bff8d283fc9cd7e2cc501fc3', 1389081582),
    ('NATION_18', 'a9ed2db7db7ba788d3ea9a7822fa812865ee60a0', 3262426751),
    ('NATION_19', '3e71fb1d6927dda5b94c6fd80ad56cd58e9c41b5', 3044253417),
    ('NATION_20', 'f3204ca364c7a9b263ac0467da774721da418dcc', 3884086670),
    ('NATION_21', '51361fe20853a86cb12de2e931475d362e6130d3', 2424653080),
    ('NATION_22', '123936e0ec1877cf44f40584335ef6a7e771af60', 160175266),
    ('NATION_23', '373800b1486d79cb703fd11ef677fad99bd8bb7d', 2123047988),
    ('NATION_24', 'e09196f17c606e72dfcaabc839280108b6ec7cc2', 3773804951)"""


@query(
    "fn_hash_sha_crc",
    oracle=f"""
    SELECT n.n_nationkey,
           sha256(n.n_name) AS sha2_hex,
           exp.sha1_hex AS sha1_hex,
           exp.crc AS crc
    FROM nation n
    JOIN ({_SHA_CRC_VALUES}) AS exp(name, sha1_hex, crc)
      ON n.n_name = exp.name
    """,
    tags=("functions", "hash", "spark-compat"),
)
def fn_hash_sha_crc(spark, sf_dir):
    """sha2(256)/sha1/crc32 (reference: test_files/spark/hash/).  DuckDB
    has no sha1/crc32 — those columns are checked against a VALUES map of
    expected digests over the fixed nation dimension (precomputed with
    hashlib/zlib, the third independent implementation)."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.sha2(F.col("n_name"), 256).alias("sha2_hex"),
        F.sha1(F.col("n_name")).alias("sha1_hex"),
        F.crc32(F.col("n_name").cast("binary")).alias("crc"),
    )


@query(
    "fn_misc_equal_null_typeof",
    oracle="""
    SELECT o_orderkey,
           (CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END
              IS NOT DISTINCT FROM o_orderstatus) AS eq_status,
           (CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END
              IS NOT DISTINCT FROM
            CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END)
             AS eq_both_null,
           lower(typeof(o_orderkey)) AS t_key,
           lower(typeof(o_totalprice)) AS t_price,
           lower(typeof(CAST(o_orderdate AS DATE))) AS t_date,
           lower(typeof(o_orderkey = 1)) AS t_bool
    FROM orders WHERE o_orderkey < 200
    """,
    tags=("functions", "misc", "spark-compat"),
)
def fn_misc_equal_null_typeof(spark, sf_dir):
    """equal_null (NULL-safe equality, ⇔ IS NOT DISTINCT FROM) and typeof
    (reference: test_files/spark/misc/equal_null.slt, typeof.slt).  Type
    names restricted to spellings both engines share after lower()."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    nullable = F.when(F.col("o_orderstatus") == "F", F.lit(None)).otherwise(
        F.col("o_orderstatus")
    )
    return o.select(
        "o_orderkey",
        F.equal_null(nullable, F.col("o_orderstatus")).alias("eq_status"),
        F.equal_null(nullable, nullable).alias("eq_both_null"),
        F.lower(F.expr("typeof(o_orderkey)")).alias("t_key"),
        F.lower(F.expr("typeof(o_totalprice)")).alias("t_price"),
        F.lower(F.expr("typeof(cast(o_orderdate as date))")).alias("t_date"),
        F.lower(F.expr("typeof(o_orderkey = 1)")).alias("t_bool"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregate", "bitmap", "spark-compat", "scale"),
)
def agg_bitmap_distinct(spark, sf_dir):
    """Exact distinct counting via bitmap buckets (reference:
    test_files/spark/bitmap/ — bitmap_bucket_number / bitmap_bit_position
    / bitmap_construct_agg / bitmap_count).

    Scale design: COUNT(DISTINCT key) shuffles every raw key; the bitmap
    path shuffles one ≤4 KB bitmap per (group, 32768-key bucket) —
    mergeable partial state, the same trick DataFusion's sketch
    aggregates use, but exact.  At 100 TB this turns a key-cardinality
    shuffle into a bucket-cardinality one."""
    o = _t(spark, sf_dir, "orders")
    per_bucket = (
        o.select(
            "o_orderpriority",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("distinct_customers")
    )


@query(
    "fn_xml_xpath",
    oracle="""
    SELECT n_nationkey,
           n_name AS xp_name,
           CAST(n_regionkey AS INT) AS xp_region,
           (n_regionkey >= 2) AS xp_flag,
           n_name || '|' || n_nationkey AS xp_all_parts
    FROM nation
    """,
    tags=("functions", "xml", "spark-compat"),
)
def fn_xml_xpath(spark, sf_dir):
    """XPath extraction over XML strings (reference: datafusion-spark
    crate test_files/spark/xml/ — xpath_string/xpath_int/xpath_boolean/
    xpath).  The XML doc is built per-row from nation columns; the oracle
    reconstructs each extracted value from the same columns (DuckDB has
    no XPath).  All four variants stay JVM-side (codegen'd Java XPath),
    no shuffle."""
    n = _t(spark, sf_dir, "nation")
    xml = F.concat(
        F.lit("<item><name>"),
        F.col("n_name"),
        F.lit("</name><region>"),
        F.col("n_regionkey").cast("string"),
        F.lit("</region><part>"),
        F.col("n_name"),
        F.lit("</part><part>"),
        F.col("n_nationkey").cast("string"),
        F.lit("</part></item>"),
    )
    return n.select(
        "n_nationkey",
        F.xpath_string(xml, F.lit("/item/name")).alias("xp_name"),
        F.xpath_int(xml, F.lit("/item/region")).alias("xp_region"),
        F.xpath_boolean(xml, F.lit("/item/region >= 2")).alias("xp_flag"),
        F.array_join(F.xpath(xml, F.lit("/item/part/text()")), "|").alias(
            "xp_all_parts"
        ),
    )


@query(
    "agg_approx_topk_exact_smallk",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events GROUP BY event_type
    ORDER BY n DESC, event_type LIMIT 3
    """,
    tags=("aggregate", "sketch", "topk"),
)
def agg_approx_topk_exact_smallk(spark, sf_dir):
    """approx_top_k heavy-hitter sketch (reference: DataFusion's sketch
    aggregates, functions-aggregate/src/approx_*.rs; Spark 4 ships the
    same Misra-Gries-style summary).  On a column whose cardinality is
    far below the sketch capacity the summary is provably exact, so the
    oracle is the exact GROUP BY top-3 — the entry pins both the sketch
    plumbing and that exactness property.  Scale: the sketch is a fixed
    ≤k-entry mergeable state per partition — heavy hitters at 100 TB
    without shuffling per-key counts."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
        .select(F.explode("tk").alias("s"))
        .select(
            F.col("s.item").alias("event_type"),
            F.col("s.count").alias("n"),
        )
    )


@query(
    "agg_theta_sketch_distinct",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    tags=("aggregate", "sketch", "distinct"),
)
def agg_theta_sketch_distinct(spark, sf_dir):
    """Theta sketch distinct counting (reference: DataFusion's
    approx_distinct HLL family; theta additionally supports set algebra
    on sketches).  At 150 distinct users the sketch retains every hash →
    exact, so the oracle is exact COUNT(DISTINCT); beyond sketch
    capacity the same plan degrades gracefully to ±1.6% error with a
    fixed 32 KB mergeable state per group — the 100 TB distinct-count
    strategy when bitmap buckets (agg_bitmap_distinct) are too wide."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("theta_sketch_estimate(theta_sketch_agg(user_id))")
        .cast("bigint")
        .alias("n_users")
    )


@query(
    "fn_mask_named_args",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_default,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '#', 'g')
             AS masked_custom,
           regexp_replace(c_name, '[0-9]', '*', 'g') AS masked_digits_only
    FROM customer WHERE c_custkey < 200
    """,
    tags=("functions", "string", "spark-compat", "named-args"),
)
def fn_mask_named_args(spark, sf_dir):
    """mask() PII masking + SQL named arguments (reference:
    test_files/spark/string/mask.slt and named_arguments.slt —
    DataFusion implements both the function and the arg => value call
    syntax).  Three call shapes: positional defaults, all-positional
    custom chars, and named-argument form skipping middle parameters —
    the named form is what the reference's named_arguments tests pin.
    Oracle re-derives each masking with regexp_replace chains."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("masked_default"),
        F.expr("mask(c_name, 'U', 'l', '#')").alias("masked_custom"),
        F.expr(
            "mask(c_name, upperChar => NULL, lowerChar => NULL, "
            "digitChar => '*')"
        ).alias("masked_digits_only"),
    )


@query(
    "fn_luhn_check",
    oracle="""
    WITH digits AS (
        SELECT c_custkey, lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS s
        FROM customer WHERE c_custkey < 500
    ),
    expanded AS (
        SELECT c_custkey, s, i,
               CAST(substr(reverse(s), i, 1) AS INT) AS d
        FROM digits, generate_series(1, 8) AS t(i)
    ),
    summed AS (
        SELECT c_custkey, s,
               SUM(CASE WHEN i % 2 = 0
                        THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
                        ELSE d END) AS total
        FROM expanded GROUP BY c_custkey, s
    )
    SELECT c_custkey, (total % 10 = 0) AS luhn_ok
    FROM summed
    """,
    tags=("functions", "string", "spark-compat"),
)
def fn_luhn_check(spark, sf_dir):
    """luhn_check credit-card checksum (reference: test_files/spark/
    string/luhn_check.slt).  The oracle computes the Luhn sum from first
    principles (reversed digit expansion + double-every-second), keeping
    the two implementations independent."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    return c.select(
        "c_custkey",
        F.expr(
            "luhn_check(lpad(CAST(c_custkey AS STRING), 8, '0'))"
        ).alias("luhn_ok"),
    )


@query(
    "fn_predicate_like_ilike",
    oracle="""
    SELECT c_custkey,
           c_name LIKE 'Customer#%' AS like_prefix,
           c_name LIKE '%00__' AS like_suffix_wild,
           c_name ILIKE 'CUSTOMER#%1' AS ilike_ci,
           (c_name || '_x') LIKE '%\\_x' ESCAPE '\\' AS like_escaped_underscore,
           c_mktsegment LIKE '%IL%' AS like_contains
    FROM customer WHERE c_custkey < 300
    """,
    tags=("functions", "predicate", "spark-compat"),
)
def fn_predicate_like_ilike(spark, sf_dir):
    """LIKE / ILIKE / ESCAPE predicates (reference: test_files/spark/
    predicate/{like,ilike}.slt).  The escaped-underscore case pins that
    '\\_' matches a literal underscore, not any-char — the classic LIKE
    bug.  All run as codegen'd string matchers; a leading-prefix LIKE is
    additionally scan-pushable (StringStartsWith in PushedFilters)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.col("c_name").like("Customer#%").alias("like_prefix"),
        F.col("c_name").like("%00__").alias("like_suffix_wild"),
        F.col("c_name").ilike("CUSTOMER#%1").alias("ilike_ci"),
        F.expr(r"concat(c_name, '_x') LIKE '%\\_x' ESCAPE '\\'").alias(
            "like_escaped_underscore"
        ),
        F.col("c_mktsegment").like("%IL%").alias("like_contains"),
    )


@query(
    "agg_try_sum_overflow",
    oracle="""
    SELECT o_orderstatus,
           CAST(NULL AS BIGINT) AS overflowed_sum,
           CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS safe_sum
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("aggregate", "try", "spark-compat"),
)
def agg_try_sum_overflow(spark, sf_dir):
    """try_sum NULL-on-overflow (reference: test_files/spark/aggregate/
    try_sum.slt).  Every group receives at least two int64-max addends →
    the sum overflows and try_sum yields NULL instead of raising (ANSI
    mode) or wrapping (legacy) — the error-safe aggregation contract.
    The same entry carries a non-overflowing try_sum to pin the happy
    path.  Oracle: the overflow column is NULL by construction."""
    o = load_table(spark, sf_dir, "orders")
    big = F.when(
        F.col("o_orderkey") % 2 == 0, F.lit(9223372036854775807).cast("long")
    ).otherwise(F.lit(1).cast("long"))
    return o.groupBy("o_orderstatus").agg(
        F.try_sum(big).alias("overflowed_sum"),
        F.try_sum(F.col("o_orderkey").cast("long")).alias("safe_sum"),
    )


@query(
    "fn_bitmap_native",
    oracle="""
    SELECT CAST(CASE WHEN l_partkey > 0
                     THEN FLOOR((l_partkey - 1) / 32768) + 1
                     ELSE 0 END AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_keys,
           CAST(MIN(CASE WHEN l_partkey > 0 THEN (l_partkey - 1) % 32768
                         ELSE -l_partkey END) AS BIGINT) AS min_bit_pos,
           CAST(MAX(CASE WHEN l_partkey > 0 THEN (l_partkey - 1) % 32768
                         ELSE -l_partkey END) AS BIGINT) AS max_bit_pos
    FROM lineitem
    WHERE l_orderkey < 5000
    GROUP BY 1
    """,
    tags=("spark-compat", "bitmap", "sketch"),
)
def fn_bitmap_native(spark, sf_dir):
    """Spark's native bitmap functions (reference: test_files/spark/
    bitmap/{bitmap_bucket_number,bitmap_bit_position,bitmap_count}.slt).
    bitmap_construct_agg builds a fixed 4 KB bitmap per 32768-key
    bucket and bitmap_count pops the bits — the oracle re-derives the
    same numbers arithmetically (bucket/bit-position formulas) plus
    COUNT(DISTINCT).  This is the engine-native twin of
    agg_bitmap_distinct: at 100 TB only ≤4 KB bitmaps shuffle, then
    bitmap_or_agg merges them losslessly (exact, mergeable, bounded)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    pos = F.expr("bitmap_bit_position(l_partkey)")
    return (
        li.select(
            F.expr("bitmap_bucket_number(l_partkey)").alias("bucket"),
            pos.alias("pos"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bitmap_count(bitmap_construct_agg(pos))").alias(
                "distinct_keys"
            ),
            F.min("pos").alias("min_bit_pos"),
            F.max("pos").alias("max_bit_pos"),
        )
    )


@query(
    "fn_string_misc_family",
    oracle="""
    SELECT r.r_regionkey,
           sx.expected AS soundex_code,
           'a' || repeat(' ', CAST(r.r_regionkey % 3 AS INT)) || 'b' AS spaced,
           hex(encode(r.r_name)) AS name_hex,
           CAST(strpos(r.r_name, 'A') AS INT) AS first_a,
           r.r_name || ' x ' || lower(r.r_name) AS sentence_words,
           TRUE AS utf8_ok
    FROM region r
    JOIN (VALUES ('AFRICA','A162'), ('AMERICA','A562'), ('ASIA','A200'),
                 ('EUROPE','E610'), ('MIDDLE EAST','M342')) sx(name, expected)
      ON r.r_name = sx.name
    """,
    tags=("spark-compat", "string"),
)
def fn_string_misc_family(spark, sf_dir):
    """String odds-and-ends from the spark-compat crate (reference:
    test_files/spark/string/{soundex,space,to_binary,instr,sentences,
    is_valid_utf8}.slt).  soundex is checked against a precomputed
    VALUES map over the 5 fixed region names (same technique as sha1 —
    DuckDB has no soundex); sentences() splits to array<array<string>>
    and is flattened+joined so the comparator sees a string; to_binary
    round-trips through hex on both engines."""
    r = load_table(spark, sf_dir, "region")
    sent = F.expr("sentences(concat(r_name, ' x. ', lower(r_name), '.'))")
    return r.select(
        "r_regionkey",
        F.soundex("r_name").alias("soundex_code"),
        F.concat(
            F.lit("a"), F.expr("space(cast(r_regionkey % 3 as int))"), F.lit("b")
        ).alias("spaced"),
        F.hex(F.expr("to_binary(r_name, 'utf-8')")).alias("name_hex"),
        F.instr("r_name", "A").alias("first_a"),
        F.array_join(F.flatten(sent), " ").alias("sentence_words"),
        F.expr("is_valid_utf8(r_name)").alias("utf8_ok"),
    )


@query(
    "fn_spark_math_bits",
    oracle="""
    SELECT p_partkey,
           bin(p_partkey)                                   AS binstr,
           round_even(p_retailprice, 0)                     AS rnd_even,
           CAST(round_even(p_retailprice, 1) AS DOUBLE)     AS bround1,
           ((p_partkey - 40) % 7 + 7) % 7                   AS pmod7,
           p_size << 2                                      AS shl,
           p_partkey >> 1                                   AS shr,
           CAST(bit_count(p_partkey) AS INT)                AS bits,
           ~p_size                                          AS bnot,
           ROUND(sqrt(CAST(p_size AS DOUBLE) * p_size
                 + p_partkey * CAST(p_partkey AS DOUBLE)), 6) AS hyp,
           ROUND(exp(p_size / 100.0) - 1, 6)                AS em1,
           ROUND(ln(1 + p_size / 100.0), 6)                 AS l1p
    FROM part WHERE p_partkey < 300 ORDER BY p_partkey
    """,
    tags=("functions", "spark-compat", "math", "bitwise"),
)
def fn_spark_math_bits(spark, sf_dir):
    """Spark math/bitwise corpus (reference test_files/spark/math/{bin,
    bround,rint,pmod,shiftleft,hypot,expm1,log1p}.slt, spark/bitwise/):
    binary rendering, HALF_EVEN rounding (rint/bround ⇔ DuckDB
    round_even), positive modulus, shifts, popcount, complement, and the
    numerically-careful hypot/expm1/log1p (compared against their naive
    expansions at 6 dp — the corpus inputs stay in the regime where both
    agree).  All JVM builtins inside codegen."""
    return spark.sql(f"""
    SELECT p_partkey,
           bin(p_partkey)                                   AS binstr,
           rint(p_retailprice)                              AS rnd_even,
           CAST(bround(p_retailprice, 1) AS DOUBLE)         AS bround1,
           pmod(p_partkey - 40, 7)                          AS pmod7,
           shiftleft(p_size, 2)                             AS shl,
           shiftright(p_partkey, 1)                         AS shr,
           CAST(bit_count(p_partkey) AS INT)                AS bits,
           ~p_size                                          AS bnot,
           ROUND(hypot(CAST(p_size AS DOUBLE), CAST(p_partkey AS DOUBLE)), 6) AS hyp,
           ROUND(expm1(p_size / 100.0), 6)                  AS em1,
           ROUND(log1p(p_size / 100.0), 6)                  AS l1p
    FROM {{src}} WHERE p_partkey < 300 ORDER BY p_partkey
    """.replace("{src}", "parquet.`" + sf_dir + "/part.parquet`"))


@query(
    "fn_spark_string_misc2",
    oracle="""
    SELECT p_partkey,
           CASE 1 + p_partkey % 3 WHEN 1 THEN p_name
                WHEN 2 THEN p_brand ELSE p_type END          AS elt_pick,
           repeat(' ', p_partkey % 4) || '|'                 AS spaced,
           printf('%d:%s', p_partkey, p_brand)               AS fmt,
           CAST(unhex('6162') AS VARCHAR)                    AS bin_txt,
           ascii(p_name)                                     AS first_code,
           CAST(strpos(p_name, 'e') AS BIGINT)               AS loc_e
    FROM part WHERE p_partkey < 300 ORDER BY p_partkey
    """,
    tags=("functions", "spark-compat", "strings"),
)
def fn_spark_string_misc2(spark, sf_dir):
    """Spark string-misc corpus (reference test_files/spark/string/{elt,
    space,format_string,to_binary,locate}.slt): 1-based ELT
    dispatch, space(), printf-style formatting,
    hex-to-binary text round-trip, and locate/instr positioning."""
    return spark.sql("""
    SELECT p_partkey,
           elt(1 + p_partkey % 3, p_name, p_brand, p_type)   AS elt_pick,
           space(CAST(p_partkey % 4 AS INT)) || '|'          AS spaced,
           format_string('%d:%s', p_partkey, p_brand)        AS fmt,
           CAST(to_binary('6162', 'hex') AS STRING)          AS bin_txt,
           ascii(p_name)                                     AS first_code,
           CAST(locate('e', p_name) AS BIGINT)               AS loc_e
    FROM parquet.`__SF__/part.parquet`
    WHERE p_partkey < 300 ORDER BY p_partkey
    """.replace("__SF__", sf_dir))


@query(
    "fn_spark_datetime_names",
    oracle="""
    SELECT event_id,
           left(monthname(ts), 3)                AS mon,
           left(dayname(ts), 3)                  AS dow_name,
           CAST(isodow(ts) - 1 AS INT)           AS wkday,
           CAST(weekofyear(ts) AS INT)           AS woy,
           CAST(quarter(ts) AS INT)              AS qtr,
           CAST(dayofyear(ts) AS INT)            AS doy,
           CAST(isodow(ts) % 7 + 1 AS INT)       AS dow_spark
    FROM events WHERE event_id < 400 ORDER BY event_id
    """,
    tags=("functions", "spark-compat", "datetime"),
)
def fn_spark_datetime_names(spark, sf_dir):
    """Spark datetime-name corpus (reference test_files/spark/datetime/
    {monthname,dayname? (via date_format),weekday,weekofyear,quarter,
    dayofyear,dayofweek}.slt): 3-letter month/day names (DuckDB's full
    names truncated to the shared prefix), Monday-0 weekday ⇔ isodow-1,
    ISO week numbers, and Spark's Sunday-1 dayofweek ⇔ isodow % 7 + 1."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    return e.selectExpr(
        "event_id",
        "monthname(ts) AS mon",
        "dayname(ts) AS dow_name",
        "weekday(ts) AS wkday",
        "CAST(weekofyear(ts) AS INT) AS woy",
        "CAST(quarter(ts) AS INT) AS qtr",
        "CAST(dayofyear(ts) AS INT) AS doy",
        "CAST(dayofweek(ts) AS INT) AS dow_spark",
    ).orderBy("event_id")


@query(
    "fn_csv_map_construction",
    oracle="""
    SELECT p_partkey,
           CAST(split_part('7,' || p_brand, ',', 1) AS INT)     AS csv_a,
           split_part('7,' || p_brand, ',', 2)                  AS csv_b,
           'STRUCT<_c0: INT, _c1: STRING>'                      AS csv_schema,
           CAST(p_size AS VARCHAR)                              AS m_s,
           CAST(p_partkey AS VARCHAR)                           AS m_k,
           CAST(p_size * 2 AS VARCHAR)                          AS me_v
    FROM part WHERE p_partkey < 300 ORDER BY p_partkey
    """,
    tags=("functions", "spark-compat", "csv", "map"),
)
def fn_csv_map_construction(spark, sf_dir):
    """Spark csv/map construction corpus (reference test_files/spark/csv/
    schema_of_csv.slt, spark/map/{str_to_map,map_from_entries}.slt):
    from_csv with an explicit schema (typed struct out of a CSV line),
    schema_of_csv inference rendering, str_to_map with custom pair/kv
    delimiters, and map_from_entries over a struct array.  The oracle
    re-derives every value from the same columns with string ops — the
    CSV/map machinery itself is what's under test on the Spark side."""
    return spark.sql("""
    SELECT p_partkey,
           from_csv('7,' || p_brand, 'a INT, b STRING').a        AS csv_a,
           from_csv('7,' || p_brand, 'a INT, b STRING').b        AS csv_b,
           schema_of_csv('7,red')                                AS csv_schema,
           CAST(element_at(str_to_map('k:' || p_partkey || ';s:' || p_size,
                ';', ':'), 's') AS STRING)                       AS m_s,
           CAST(element_at(str_to_map('k:' || p_partkey || ';s:' || p_size,
                ';', ':'), 'k') AS STRING)                       AS m_k,
           CAST(element_at(map_from_entries(
                array(struct('v', p_size * 2))), 'v') AS STRING) AS me_v
    FROM parquet.`__SF__/part.parquet`
    WHERE p_partkey < 300 ORDER BY p_partkey
    """.replace("__SF__", sf_dir))


@query(
    "fn_spark_trig_inverse",
    oracle="""
    SELECT round(acos(0.5), 9) + 0.0            AS acos_half,
           round(asin(0.5), 9) + 0.0            AS asin_half,
           round(atan(1.0), 9) + 0.0            AS atan_one,
           round(atan2(-1.0, -1.0), 9) + 0.0    AS atan2_q3,
           round(tan(pi()/4), 9) + 0.0          AS tan_pi4,
           round(cot(1.0), 9) + 0.0             AS cot_one,
           round(1.0/sin(1.0), 9) + 0.0         AS csc_one,
           round(1.0/cos(1.0), 9) + 0.0         AS sec_one,
           round(0.5*ln(1.5/0.5), 9) + 0.0      AS atanh_half,
           round(ln(2.0+sqrt(3.0)), 9) + 0.0    AS acosh_two,
           round(ln(0.5+sqrt(1.25)), 9) + 0.0   AS asinh_half,
           'NaN'                                AS acos_oob,
           'NaN'                                AS asin_oob,
           'Infinity'                           AS atanh_pole,
           'NaN'                                AS atanh_oob,
           'NaN'                                AS acosh_oob,
           'Infinity'                           AS cot_pole
    """,
    tags=("functions", "spark-compat", "math", "edge"),
)
def fn_spark_trig_inverse(spark, sf_dir):
    """Inverse/reciprocal trig surface (reference test_files/spark/math/
    {acos,asin,atan,atan2,atanh,acosh,asinh,tan,cot,csc,sec}.slt).
    In-domain values are rounded to 9 places (+0.0 signed-zero guard)
    because DuckDB lacks atanh/acosh/asinh and the ln() spellings differ
    from java.lang.Math in the last ulp.  Out-of-domain inputs are the
    real corner: Spark returns NaN (acos/asin beyond [-1,1], atanh beyond
    (-1,1), acosh below 1) or Infinity (atanh at the ±1 pole, cot at 0)
    where DuckDB raises — so those are pinned as rendered literals the
    oracle states directly."""
    return spark.sql("""
    SELECT round(acos(0.5), 9) + CAST(0.0 AS DOUBLE)          AS acos_half,
           round(asin(0.5), 9) + CAST(0.0 AS DOUBLE)          AS asin_half,
           round(atan(1.0), 9) + CAST(0.0 AS DOUBLE)          AS atan_one,
           round(atan2(-1.0, -1.0), 9) + CAST(0.0 AS DOUBLE)  AS atan2_q3,
           round(tan(pi()/4), 9) + CAST(0.0 AS DOUBLE)        AS tan_pi4,
           round(cot(1.0), 9) + CAST(0.0 AS DOUBLE)           AS cot_one,
           round(csc(1.0), 9) + CAST(0.0 AS DOUBLE)           AS csc_one,
           round(sec(1.0), 9) + CAST(0.0 AS DOUBLE)           AS sec_one,
           round(atanh(0.5), 9) + CAST(0.0 AS DOUBLE)         AS atanh_half,
           round(acosh(2.0), 9) + CAST(0.0 AS DOUBLE)         AS acosh_two,
           round(asinh(0.5), 9) + CAST(0.0 AS DOUBLE)         AS asinh_half,
           CAST(acos(2.0) AS STRING)                          AS acos_oob,
           CAST(asin(-2.0) AS STRING)                         AS asin_oob,
           CAST(atanh(1.0) AS STRING)                         AS atanh_pole,
           CAST(atanh(2.0) AS STRING)                         AS atanh_oob,
           CAST(acosh(0.5) AS STRING)                         AS acosh_oob,
           CAST(cot(0.0) AS STRING)                           AS cot_pole
    """)


@query(
    "fn_spark_round_modes",
    oracle="""
    SELECT round(CAST(2.5 AS DOUBLE))   AS round_half_pos,
           round(CAST(-2.5 AS DOUBLE))  AS round_half_neg,
           round(CAST(2.675 AS DOUBLE), 2) AS round_scale2,
           2.0                          AS rint_half_even_lo,
           4.0                          AS rint_half_even_hi,
           2.0                          AS bround_pos,
           -2.0                         AS bround_neg,
           '3'                          AS round_dec_str,
           '2'                          AS bround_dec_str,
           CAST(ceil(2.1) AS BIGINT)    AS ceil_up,
           CAST(floor(-2.1) AS BIGINT)  AS floor_down
    """,
    tags=("functions", "spark-compat", "math", "edge"),
)
def fn_spark_round_modes(spark, sf_dir):
    """Rounding-mode matrix (reference test_files/spark/math/{round,bround,
    rint,ceil,floor}.slt): Spark round() is HALF_UP (2.5→3, -2.5→-3),
    rint()/bround() are HALF_EVEN (2.5→2, 3.5→4; bround(-2.5)→-2).  DuckDB
    round() on DOUBLE is also half-away-from-zero, so those compare live;
    the HALF_EVEN results and DECIMAL-typed renders are pinned as literals
    (DuckDB has no rint/bround)."""
    return spark.sql("""
    SELECT round(CAST(2.5 AS DOUBLE))             AS round_half_pos,
           round(CAST(-2.5 AS DOUBLE))            AS round_half_neg,
           round(CAST(2.675 AS DOUBLE), 2)        AS round_scale2,
           rint(CAST(2.5 AS DOUBLE))              AS rint_half_even_lo,
           rint(CAST(3.5 AS DOUBLE))              AS rint_half_even_hi,
           bround(CAST(2.5 AS DOUBLE))            AS bround_pos,
           bround(CAST(-2.5 AS DOUBLE))           AS bround_neg,
           CAST(round(2.5) AS STRING)             AS round_dec_str,
           CAST(bround(2.5) AS STRING)            AS bround_dec_str,
           CAST(ceil(2.1) AS BIGINT)              AS ceil_up,
           CAST(floor(-2.1) AS BIGINT)            AS floor_down
    """)


@query(
    "fn_spark_reflect_misc",
    oracle="""
    SELECT '7'        AS refl_max,
           '0.0'      AS refl_log,
           '42'       AS refl_valueof,
           'a9993e364706816aba3e25717850c26c9cd0d89d' AS sha_alias,
           CAST(1423657621850124518 AS BIGINT)        AS xxh64_abc,
           'abc'      AS mvu_pass,
           TRUE       AS ivu_pass,
           'T522'     AS sdx,
           CAST(2 AS INT) AS fis_b,
           'b'        AS elt_two,
           '''ab'''   AS quoted
    """,
    tags=("functions", "spark-compat", "misc", "string"),
)
def fn_spark_reflect_misc(spark, sf_dir):
    """JVM-reflection and misc string/hash surface (reference
    test_files/spark/misc/{reflect,java_method}.slt, hash/xxhash64.slt,
    string/{make_valid_utf8,is_valid_utf8,soundex,find_in_set,elt,quote}
    .slt, hash/sha.slt): reflect/java_method call static JVM methods and
    render the result as STRING; sha() is the sha1 alias; xxhash64 uses
    Spark's fixed seed 42.  None of these exist in DuckDB, so the oracle
    states the independently derivable answers (hashlib/known soundex
    code) as literals."""
    return spark.sql("""
    SELECT reflect('java.lang.Math', 'max', 3, 7)                 AS refl_max,
           java_method('java.lang.Math', 'log', CAST(1.0 AS DOUBLE)) AS refl_log,
           reflect('java.lang.String', 'valueOf', 42)             AS refl_valueof,
           sha('abc')                                             AS sha_alias,
           xxhash64('abc')                                        AS xxh64_abc,
           make_valid_utf8('abc')                                 AS mvu_pass,
           is_valid_utf8('abc')                                   AS ivu_pass,
           soundex('Tymczak')                                     AS sdx,
           find_in_set('b', 'a,b,c')                              AS fis_b,
           elt(2, 'a', 'b', 'c')                                  AS elt_two,
           quote('ab')                                            AS quoted
    """)


@query(
    "fn_spark_nondet_invariants",
    oracle="""
    SELECT TRUE AS rand_unit, TRUE AS randn_bound, TRUE AS uuid_v4,
           TRUE AS mono_distinct, TRUE AS pid_nonneg,
           TRUE AS block_start_zero, TRUE AS block_len_pos,
           TRUE AS file_name_ok, TRUE AS version_fmt, TRUE AS clock_sane,
           TRUE AS curdate_alias, TRUE AS tz_utc, TRUE AS ctx_nonnull,
           TRUE AS assert_null
    """,
    tags=("functions", "spark-compat", "misc", "nondeterministic"),
)
def fn_spark_nondet_invariants(spark, sf_dir):
    """Nondeterministic / environment function surface (reference
    test_files/spark/misc/{uuid,monotonically_increasing_id,
    spark_partition_id,input_file_block_start,input_file_block_length,
    version,current_catalog,current_database,current_user,assert_true}
    .slt, math/{rand,randn}.slt, datetime/{curdate,current_timestamp,
    current_timezone}.slt).  Values can't be pinned cross-engine, so the
    entry asserts the invariants the reference's own tests assert —
    rand ∈ [0,1), uuid is RFC-4122 v4 shaped, monotonically_increasing_id
    is distinct per row, file-block metadata of a single-block parquet is
    (0, size>0), the session clock/zone/context are sane — each reduced
    to a BOOLEAN the oracle states as TRUE."""
    return spark.sql("""
    SELECT every(r1 >= 0 AND r1 < 1 AND r2 >= 0 AND r2 < 1)  AS rand_unit,
           every(abs(rn) < 50)                               AS randn_bound,
           every(length(u) = 36 AND substr(u, 15, 1) = '4')  AS uuid_v4,
           count(DISTINCT mid) = count(*)                    AS mono_distinct,
           every(pid >= 0)                                   AS pid_nonneg,
           every(bs = 0)                                     AS block_start_zero,
           every(bl > 0)                                     AS block_len_pos,
           every(fnm LIKE '%region.parquet')                 AS file_name_ok,
           every(version() RLIKE '^[0-9]+[.][0-9]+')         AS version_fmt,
           every(current_timestamp() > timestamp'2020-01-01') AS clock_sane,
           every(curdate() = current_date())                 AS curdate_alias,
           every(current_timezone() = 'UTC')                 AS tz_utc,
           every(current_database() IS NOT NULL
                 AND current_catalog() IS NOT NULL
                 AND current_user() IS NOT NULL
                 AND current_schema() IS NOT NULL)           AS ctx_nonnull,
           every(assert_true(1 < 2) IS NULL)                 AS assert_null
    FROM (
        SELECT rand() AS r1, rand() AS r2, randn() AS rn, uuid() AS u,
               monotonically_increasing_id() AS mid,
               spark_partition_id() AS pid,
               input_file_block_start() AS bs,
               input_file_block_length() AS bl,
               input_file_name() AS fnm
        FROM parquet.`__SF__/region.parquet`
    )
    """.replace("__SF__", sf_dir))
