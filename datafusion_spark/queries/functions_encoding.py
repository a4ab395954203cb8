"""Encoding + unicode scalar function parity (SURVEY §2.10 gap closure).

Reference: datafusion/functions/src/encoding/{encode,decode}.rs (base64/hex
codecs) and datafusion/functions/src/unicode/ (initcap, translate,
character_length, substr_index, find_in_set, levenshtein...).  All of this
maps to JVM-side pyspark.sql.functions — no Python in the hot path, full
whole-stage codegen.

Cross-engine notes discovered by probing (kept here so the oracle stays
honest):
  - Spark ``base64`` uses the MIME encoder: a ``\\r\\n`` every 76 chars.
    DuckDB ``to_base64`` never wraps → strip the line breaks on the Spark
    side (pure formatting, the payload is identical).
  - Spark ``hex`` and DuckDB ``hex``/``to_hex`` agree (uppercase), both on
    strings and integers.
  - Spark ``char(n)`` wraps at 256; only exercise ASCII codepoints.
  - DuckDB lacks ``initcap``/``substring_index`` → emulated in the oracle
    with list lambdas (split → upper first char → join), which also pins
    Spark's exact semantics (split on single space, lowercase the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "fn_encoding_base64_hex",
    oracle="""
    SELECT p_partkey,
           to_base64(encode(p_name)) AS b64,
           decode(from_base64(to_base64(encode(p_type)))) AS b64_roundtrip,
           hex(p_brand) AS hex_str,
           decode(unhex(hex(p_type))) AS hex_roundtrip,
           to_hex(p_partkey) AS hex_int,
           CAST(octet_length(encode(p_name)) AS BIGINT) AS n_bytes
    FROM part WHERE p_partkey < 300
    """,
    tags=("functions", "encoding"),
)
def fn_encoding_base64_hex(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    # strip MIME line breaks: Spark's base64 wraps at 76 chars, DuckDB's
    # doesn't; the payload bytes are identical.
    b64 = F.regexp_replace(F.base64(F.encode(F.col("p_name"), "UTF-8")), r"\r\n", "")
    return p.select(
        "p_partkey",
        b64.alias("b64"),
        F.decode(F.unbase64(F.base64(F.encode(F.col("p_type"), "UTF-8"))), "UTF-8")
        .alias("b64_roundtrip"),
        F.hex(F.col("p_brand")).alias("hex_str"),
        F.decode(F.unhex(F.hex(F.col("p_type"))), "UTF-8").alias("hex_roundtrip"),
        F.hex(F.col("p_partkey")).alias("hex_int"),
        F.octet_length("p_name").cast("long").alias("n_bytes"),
    )


@query(
    "fn_unicode_family",
    oracle="""
    SELECT p_partkey,
           array_to_string(
             list_transform(string_split(lower(p_name), ' '),
                            x -> upper(x[1]) || x[2:]), ' ') AS name_title,
           translate(p_type, 'aeiou', '_____') AS type_devoweled,
           CAST(levenshtein(p_brand, p_type) AS BIGINT) AS brand_type_dist,
           array_to_string(string_split(p_name, ' ')[1:2], ' ') AS first_two_words,
           chr(CAST(65 + (p_partkey % 26) AS INT)) AS letter,
           CAST(unicode(p_name) AS BIGINT) AS first_codepoint,
           printf('%s#%05d', p_brand, p_partkey) AS tagged,
           CAST(length(p_name) AS BIGINT) AS char_len
    FROM part WHERE p_partkey < 300
    """,
    tags=("functions", "unicode"),
)
def fn_unicode_family(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("name_title"),
        F.translate(F.col("p_type"), "aeiou", "_____").alias("type_devoweled"),
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
        F.substring_index(F.col("p_name"), " ", 2).alias("first_two_words"),
        F.char(F.lit(65) + F.col("p_partkey") % 26).alias("letter"),
        F.ascii("p_name").cast("long").alias("first_codepoint"),
        F.format_string("%s#%05d", F.col("p_brand"), F.col("p_partkey")).alias("tagged"),
        F.char_length("p_name").cast("long").alias("char_len"),
    )
