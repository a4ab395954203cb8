"""Every name the dialect maps must translate AND execute on Spark.

For each entry in RENAMES/TEMPLATES a representative DataFusion-dialect
call is built, translated, and executed (batched ~12 per SELECT so the
whole surface costs a handful of Spark jobs).  This is the regression net
for the translator: a template that emits invalid Spark SQL, or a rename
onto a function whose argument shapes don't line up, fails here by name.
"""

from __future__ import annotations

import pytest

from datafusion_spark.compat.dialect import RENAMES, TEMPLATES, translate_sql

# Representative DataFusion-dialect argument lists.  Values are chosen so
# every call is type-valid after translation (arrays of ints, strings,
# timestamps where needed).
_ARR = "make_array(3, 1, 2)"
_ARRB = "make_array(2, 3)"
_DARR = "make_array(1.0, 2.0)"
_TS = "to_timestamp_seconds(1700000000)"

_EXAMPLES: dict[str, str] = {
    # math
    "random": "random()",
    "signum": "signum(-3.5)",
    "log": "log(100.0)",
    "trunc": "trunc(3.99)",
    "gcd": "gcd(12, 18)",
    "lcm": "lcm(4, 6)",
    "iszero": "iszero(0.0)",
    # string
    "to_hex": "to_hex(255)",
    "strpos": "strpos('hello', 'll')",
    "starts_with": "starts_with('abc', 'ab')",
    "ends_with": "ends_with('abc', 'bc')",
    "substr_index": "substr_index('a.b.c', '.', 2)",
    # datetime
    "to_timestamp_seconds": "to_timestamp_seconds(1700000000)",
    "to_timestamp_millis": "to_timestamp_millis(1700000000000)",
    "to_timestamp_micros": "to_timestamp_micros(1700000000000000)",
    "to_timestamp_nanos": "to_timestamp_nanos(1700000000000000000)",
    "to_unixtime": f"to_unixtime({_TS})",
    "today": "today()",
    "datepart": f"datepart('hour', {_TS})",
    "datetrunc": f"datetrunc('day', {_TS})",
    "from_unixtime": "from_unixtime(1700000000)",
    "date_bin": f"date_bin(INTERVAL '15 minutes', {_TS})",
    "date_format": f"date_format({_TS}, '%Y-%m-%d')",
    "to_char": f"to_char({_TS}, '%H:%M')",
    "to_date": "to_date('2024-03-05', '%Y-%m-%d')",
    "to_timestamp": "to_timestamp('2024-03-05 10:00:00', '%Y-%m-%d %H:%M:%S')",
    # hashing / encoding
    "encode": "encode('ab', 'hex')",
    "decode": "decode('6162', 'hex')",
    "digest": "digest('ab', 'sha256')",
    "md5": "md5('ab')",
    "sha224": "sha224('ab')",
    "sha256": "sha256('ab')",
    "sha384": "sha384('ab')",
    "sha512": "sha512('ab')",
    "arrow_cast": "arrow_cast(1.5, 'Int64')",
    "arrow_try_cast": "arrow_try_cast('x', 'Int32')",
    "arrow_typeof": "arrow_typeof(1)",
    "regexp_replace": "regexp_replace('aaa', 'a', 'b', 'g')",
    "regexp_like": "regexp_like('AbC', 'abc', 'i')",
    # aggregates are exercised with a GROUP BY-free SELECT over VALUES
    "approx_distinct": None,
    "approx_median": None,
    "approx_percentile_cont": None,
    "percentile_cont": None,
    "quantile_cont": None,
    "var_population": None,
    "var_sample": None,
    "covar": None,
    "mean": None,
    "string_agg": None,
    # struct / map
    "row": "row(1, 'a')",
    "map": "map(make_array('k'), make_array(1))",
    "map_extract": "map_extract(map(make_array('k'), make_array(1)), 'k')",
}

_AGG_SQL = """
SELECT approx_distinct(x)            AS a1,
       approx_median(x)              AS a2,
       approx_percentile_cont(x, 0.5) AS a3,
       percentile_cont(x, 0.5)       AS a4,
       quantile_cont(x, 0.5)         AS a5,
       var_population(x)             AS a6,
       var_sample(x)                 AS a7,
       covar(x, x)                   AS a8,
       mean(x)                       AS a9,
       string_agg(CAST(x AS STRING), ',' ORDER BY x) AS a10
FROM (SELECT 1.0 AS x UNION ALL SELECT CAST(2.5 AS DOUBLE) UNION ALL SELECT 4.0) t
"""


def _default_example(name: str) -> str:
    # array/list family defaults, keyed by suffix
    two_arr = {"has_all", "has_any", "cat", "concat", "union", "intersect",
               "except", "zip", "add", "subtract", "distance"}
    lam = {"transform": f"({_ARR}, x -> x + 1)", "filter": f"({_ARR}, x -> x > 1)"}
    if name in ("dot_product", "inner_product", "cosine_distance"):
        return f"{name}({_DARR}, {_DARR})"
    base = name.split("_", 1)[1] if "_" in name else name
    if base in lam:
        return f"{name}{lam[base]}"
    if base in two_arr:
        return f"{name}({_ARR}, {_ARRB})"
    if base in ("position", "indexof", "has", "contains"):
        return f"{name}({_ARR}, 2)"
    if base in ("element", "extract"):
        return f"{name}({_ARR}, 1)"
    if base in ("join", "to_string"):
        return f"{name}({_ARR}, ',')"
    if base in ("slice",):
        return f"{name}({_ARR}, 1, 2)"
    if base in ("append", "prepend", "push_back", "push_front", "remove",
                "remove_all", "positions"):
        return f"{name}({_ARR}, 2)"
    if base in ("repeat",):
        return f"{name}(7, 3)"
    if base in ("replace", "replace_all"):
        return f"{name}({_ARR}, 1, 9)"
    if base in ("resize",):
        return f"{name}({_ARR}, 5, 0)"
    if base in ("scale",):
        return f"{name}({_ARR}, 2)"
    if base in ("sort",):
        return f"{name}({_ARR}, 'DESC')"
    if base in ("normalize", "sum", "avg", "product"):
        return f"{name}({_DARR})"
    if name in ("dot_product", "inner_product", "cosine_distance"):
        return f"{name}({_DARR}, {_DARR})"
    if name in ("any_match", "array_any_match", "list_any_match"):
        return f"{name}({_ARR}, x -> x = 2)"
    if name in ("generate_series", "range"):
        return f"{name}(1, 5)"
    if name in ("string_to_array", "string_to_list"):
        return f"{name}('a,b', ',')"
    if name in ("make_array", "make_list"):
        return f"{name}(1, 2)"
    # single-array default
    return f"{name}({_ARR})"


def _all_examples() -> list[tuple[str, str]]:
    out = []
    for name in sorted(set(RENAMES) | set(TEMPLATES)):
        ex = _EXAMPLES.get(name, "__default__")
        if ex is None:
            continue                      # covered by _AGG_SQL
        out.append((name, _default_example(name) if ex == "__default__" else ex))
    return out


def test_every_mapped_function_translates():
    for name, ex in _all_examples():
        out = translate_sql(f"SELECT {ex}")
        assert out != f"SELECT {ex}" or name in ("md5",), name


def test_every_mapped_function_executes(spark):
    examples = _all_examples()
    batch = 12
    for i in range(0, len(examples), batch):
        chunk = examples[i:i + batch]
        cols = ", ".join(
            f"{ex} AS c{j}" for j, (_, ex) in enumerate(chunk))
        sql = translate_sql(f"SELECT {cols}")
        try:
            spark.sql(sql).collect()
        except Exception as e:  # noqa: BLE001 — name the offender
            for name, ex in chunk:
                one = translate_sql(f"SELECT {ex}")
                try:
                    spark.sql(one).collect()
                except Exception as e1:  # noqa: BLE001
                    pytest.fail(f"{name}: {ex} -> {one}: {str(e1).splitlines()[0]}")
            raise e


def test_aggregate_renames_execute(spark):
    rows = spark.sql(translate_sql(_AGG_SQL)).collect()
    assert len(rows) == 1 and rows[0].a9 == 2.5
