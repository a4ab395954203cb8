"""DataFusion SQL dialect → Spark SQL source-to-source translator.

The reference's SQL surface (docs/source/user-guide/sql/*.md; function
implementations under datafusion/functions*/src/) largely overlaps Spark's,
but ~120 names differ in spelling, argument order, or need an expression
template.  ``translate_sql`` rewrites DataFusion-dialect text into Spark SQL
so existing queries run unmodified through ``spark.sql`` — and, because the
output is ordinary Spark SQL, Catalyst still does pushdown / pruning /
codegen on the result (nothing here executes Python at runtime).

Mechanics: a literal-aware scanner walks the text; every identifier followed
by ``(`` whose lowercase name is in the mapping gets its argument list parsed
(balanced parens, top-level commas), each argument recursively translated,
then re-emitted via a rename or an expression template.  String literals,
quoted identifiers, and comments are never touched.

Three honesty levels:
  * RENAMES / TEMPLATES — semantics verified equal on the agreeing surface
    (divergences that remain are listed in the module-level notes below).
  * UNSUPPORTED — raises ``DialectError`` naming the reason, instead of
    silently computing something else.

Known, documented divergences (kept because the alternative is rejecting
the query): ``regexp_replace`` without flags replaces ALL matches on Spark
(PostgreSQL/DataFusion replace only the first; pass the ``'g'`` flag in
reference SQL for identical behaviour — the flag is dropped in
translation). ``struct(...)`` field names are Spark-derived, not ``c0..cn``.
``array_sum``/``array_avg``/``array_product`` return DOUBLE.
"""

from __future__ import annotations

import re

__all__ = ["translate_sql", "DialectError"]


class DialectError(NotImplementedError):
    """A DataFusion construct this translator refuses to guess at."""


# ---------------------------------------------------------------------------
# Plain renames: same argument order and agreeing semantics.
# ---------------------------------------------------------------------------

RENAMES: dict[str, str] = {
    # math
    "random": "rand",
    "signum": "sign",
    # string
    "to_hex": "hex",
    "strpos": "instr",           # strpos(str, substr) == instr(str, substr)
    "starts_with": "startswith",
    "ends_with": "endswith",
    "substr_index": "substring_index",
    # datetime
    "to_timestamp_seconds": "timestamp_seconds",
    "to_timestamp_millis": "timestamp_millis",
    "to_timestamp_micros": "timestamp_micros",
    "to_unixtime": "unix_timestamp",
    "today": "current_date",
    "datepart": "date_part",
    "datetrunc": "date_trunc",
    # arrays (list_* are DataFusion aliases of array_*)
    "make_array": "array",
    "make_list": "array",
    "array_element": "element_at",
    "list_element": "element_at",
    "array_extract": "element_at",
    "list_extract": "element_at",
    "list_append": "array_append",
    "array_push_back": "array_append",
    "list_push_back": "array_append",
    "list_prepend": "array_prepend",
    "array_push_front": "array_prepend",
    "list_push_front": "array_prepend",
    "array_cat": "concat",
    "array_concat": "concat",
    "list_cat": "concat",
    "list_concat": "concat",
    "list_compact": "array_compact",
    "array_has": "array_contains",
    "list_has": "array_contains",
    "list_contains": "array_contains",
    "array_has_any": "arrays_overlap",
    "list_has_any": "arrays_overlap",
    "list_distinct": "array_distinct",
    "list_except": "array_except",
    "array_indexof": "array_position",
    "list_indexof": "array_position",
    "list_position": "array_position",
    "list_intersect": "array_intersect",
    "array_to_string": "array_join",
    "list_to_string": "array_join",
    "list_join": "array_join",
    "array_length": "cardinality",
    "list_length": "cardinality",
    "list_max": "array_max",
    "list_min": "array_min",
    "list_remove_all": "array_remove",   # Spark array_remove removes all
    "array_remove_all": "array_remove",
    "list_repeat": "array_repeat",
    "array_reverse": "reverse",
    "list_reverse": "reverse",
    "array_transform": "transform",
    "list_transform": "transform",
    "array_filter": "filter",
    "list_filter": "filter",
    "any_match": "exists",
    "array_any_match": "exists",
    "list_any_match": "exists",
    "list_union": "array_union",
    "list_zip": "arrays_zip",
    "generate_series": "sequence",       # both inclusive of stop
    "string_to_list": "split",
    "string_to_array": "split",          # NB: Spark delimiter is a regex
    # struct / map
    "row": "struct",
    "map": "map_from_arrays",            # DF map takes [keys], [values]
    # aggregates
    "approx_distinct": "approx_count_distinct",
    "approx_percentile_cont": "percentile_approx",
    "percentile_cont": "percentile",
    "quantile_cont": "percentile",
    "var_population": "var_pop",
    "var_sample": "var_samp",
    "covar": "covar_samp",
    "mean": "avg",
}

# ---------------------------------------------------------------------------
# Constructs with no faithful Spark equivalent — refuse loudly.
# ---------------------------------------------------------------------------

UNSUPPORTED: dict[str, str] = {
    "make_time": "Spark has no TIME type",
    "to_time": "Spark has no TIME type",
    "to_local_time": "Spark has no TIME type; use from_utc_timestamp",
    "current_time": "Spark has no TIME type",
    "union_extract": "Spark has no union type",
    "union_tag": "Spark has no union type",
    "cast_to_type": "pass a type literal to CAST instead",
    "try_cast_to_type": "pass a type literal to TRY_CAST instead",
    "with_metadata": "Arrow field metadata is not addressable in Spark SQL",
    "arrow_field": "Arrow field metadata is not addressable in Spark SQL",
    "arrow_metadata": "Arrow field metadata is not addressable in Spark SQL",
    "file_row_index": "use _metadata.row_index on a parquet scan",
    "get_field": "use struct dot-syntax (s.field) in Spark SQL",
    "regexp_match": "returns first-match capture list; use regexp_extract_all"
                    " (all matches of one group) and adapt",
    "array_remove_n": "no first-n remove on Spark; compose slice/filter",
    "list_remove_n": "no first-n remove on Spark; compose slice/filter",
    "array_replace_n": "no first-n replace on Spark; compose transform",
    "list_replace_n": "no first-n replace on Spark; compose transform",
    "approx_percentile_cont_with_weight": "no weighted t-digest in Spark;"
                                          " expand weights or use percentile",
}

# ---------------------------------------------------------------------------
# Expression templates.
# ---------------------------------------------------------------------------

_ARROW_TYPES = {
    "int8": "TINYINT", "int16": "SMALLINT", "int32": "INT", "int64": "BIGINT",
    "uint8": "SMALLINT", "uint16": "INT", "uint32": "BIGINT", "uint64": "BIGINT",
    "float16": "FLOAT", "float32": "FLOAT", "float64": "DOUBLE",
    "utf8": "STRING", "largeutf8": "STRING", "utf8view": "STRING",
    "binary": "BINARY", "largebinary": "BINARY", "binaryview": "BINARY",
    "boolean": "BOOLEAN", "date32": "DATE", "date64": "DATE",
}

_CHRONO_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%e": "d",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss", "%f": "SSSSSS",
    "%j": "DDD", "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM",
    "%p": "a", "%%": "%",
}

_INTERVAL_UNIT_US = {
    "microsecond": 1, "microseconds": 1,
    "millisecond": 1_000, "milliseconds": 1_000,
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
    "week": 7 * 86_400_000_000, "weeks": 7 * 86_400_000_000,
}


def _raise(exc: Exception):
    raise exc


def _lit_str(arg: str) -> str | None:
    """The python value of a simple '...' literal argument, else None."""
    a = arg.strip()
    if len(a) >= 2 and a[0] == "'" and a[-1] == "'" and "'" not in a[1:-1]:
        return a[1:-1]
    return None


def _interval_us(arg: str) -> int | None:
    """Micros in an INTERVAL literal like ``INTERVAL '15 minutes'`` or
    ``INTERVAL '1' HOUR``; None if not a recognizable literal."""
    a = arg.strip()
    m = re.fullmatch(r"(?is)interval\s+'([^']+)'\s*([a-z]+)?", a)
    if not m:
        return None
    body, unit = m.group(1).strip(), (m.group(2) or "").lower()
    if unit:
        mult = _INTERVAL_UNIT_US.get(unit.rstrip("s") + "s") or _INTERVAL_UNIT_US.get(unit)
        if mult is None or not re.fullmatch(r"\d+", body):
            return None
        return int(body) * mult
    total, pos = 0, 0
    for m2 in re.finditer(r"(\d+)\s*([a-z]+)", body.lower()):
        mult = _INTERVAL_UNIT_US.get(m2.group(2))
        if mult is None:
            return None
        total += int(m2.group(1)) * mult
        pos = m2.end()
    if pos == 0 or body[pos:].strip():
        return None
    return total


def _chrono_fmt(fmt: str, fname: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%":
            code = fmt[i:i + 2]
            if code not in _CHRONO_TO_JAVA:
                raise DialectError(f"{fname}: chrono format {code!r} has no Spark mapping")
            out.append(_CHRONO_TO_JAVA[code])
            i += 2
        elif fmt[i].isalpha():
            out.append(f"'{fmt[i]}'")
            i += 1
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def _t_log(a):
    if len(a) == 1:                       # unary log is base 10 in DataFusion
        return f"log10({a[0]})"
    return f"log({a[0]}, {a[1]})"


def _t_trunc(a):
    if len(a) == 1:
        return f"CAST(CAST({a[0]} AS BIGINT) AS DOUBLE)"
    return (f"(CAST(CAST(({a[0]}) * power(10, {a[1]}) AS BIGINT) AS DOUBLE)"
            f" / power(10, {a[1]}))")


_GCD = ("aggregate(sequence(1, 92), struct(CAST(abs({x}) AS BIGINT) AS a,"
        " CAST(abs({y}) AS BIGINT) AS b), (acc, i) -> IF(acc.b = 0, acc,"
        " struct(acc.b AS a, acc.a % acc.b AS b))).a")


def _t_gcd(a):
    # bounded Euclid fold, JVM-side (92 steps covers any 64-bit pair);
    # same construction as queries/functions_extended.fn_math_gcd_lcm.
    return "(" + _GCD.format(x=a[0], y=a[1]) + ")"


def _t_lcm(a):
    g = _GCD.format(x=a[0], y=a[1])
    return (f"(CASE WHEN ({a[0]}) = 0 OR ({a[1]}) = 0 THEN 0 ELSE"
            f" CAST(abs(CAST({a[0]} AS BIGINT) * CAST({a[1]} AS BIGINT)) / ({g}) AS BIGINT) END)")


def _t_date_bin(a):
    us = _interval_us(a[0])
    if us is None:
        raise DialectError("date_bin: stride must be an INTERVAL literal")
    src = a[1]
    origin = f"unix_micros({a[2]})" if len(a) > 2 else "0"
    return (f"timestamp_micros(unix_micros({src}) -"
            f" pmod(unix_micros({src}) - {origin}, {us}))")


def _t_encode(a):
    enc = (_lit_str(a[1]) or "").lower()
    if enc == "hex":
        return f"lower(hex({a[0]}))"
    if enc == "base64":
        return f"base64({a[0]})"
    raise DialectError("encode: encoding must be a 'hex'/'base64' literal")


def _t_decode(a):
    enc = (_lit_str(a[1]) or "").lower()
    if enc == "hex":
        return f"unhex({a[0]})"
    if enc == "base64":
        return f"unbase64({a[0]})"
    raise DialectError("decode: encoding must be a 'hex'/'base64' literal")


def _t_digest(a):
    algo = (_lit_str(a[1]) or "").lower()
    if algo == "md5":
        return f"unhex(md5({a[0]}))"
    if algo in ("sha224", "sha256", "sha384", "sha512"):
        return f"unhex(sha2({a[0]}, {algo[3:]}))"
    raise DialectError(f"digest: unsupported algorithm {algo!r}")


def _t_arrow_cast(a, try_=False):
    t = _lit_str(a[1])
    spark_t = _ARROW_TYPES.get((t or "").lower())
    if spark_t is None:
        raise DialectError(f"arrow_cast: no Spark mapping for arrow type {t!r}")
    return f"{'TRY_CAST' if try_ else 'CAST'}({a[0]} AS {spark_t})"


def _t_fmt2(spark_name):
    """date_format/to_char/to_date/to_timestamp with a chrono format literal."""

    def t(a, _n=spark_name):
        if len(a) == 1:
            return f"{_n}({a[0]})"
        fmt = _lit_str(a[1])
        if fmt is None:
            raise DialectError(f"{_n}: format must be a string literal")
        return f"{_n}({a[0]}, '{_chrono_fmt(fmt, _n)}')"

    return t


def _t_regexp_replace(a):
    if len(a) == 4:
        flags = _lit_str(a[3])
        if flags is not None and set(flags) <= {"g", "i"}:
            pat = f"'(?i)' || {a[1]}" if "i" in flags else a[1]
            return f"regexp_replace({a[0]}, {pat}, {a[2]})"
        raise DialectError("regexp_replace: unsupported flags (only g/i literals)")
    return f"regexp_replace({', '.join(a)})"


def _t_string_agg(a):
    # string_agg(e, d ORDER BY k) -> listagg(e, d) WITHIN GROUP (ORDER BY k)
    m = re.split(r"(?is)\border\s+by\b", a[-1], maxsplit=1)
    if len(m) == 2:
        rest = [*a[:-1], m[0].strip()]
        return (f"listagg({', '.join(rest)}) WITHIN GROUP (ORDER BY {m[1].strip()})")
    return f"string_agg({', '.join(a)})"


def _t_range(a):
    if len(a) == 1:
        return f"sequence(0, ({a[0]}) - 1)"            # range(stop), exclusive
    if len(a) == 2:
        return f"sequence({a[0]}, ({a[1]}) - 1)"
    return (f"sequence({a[0]}, ({a[1]}) - CASE WHEN ({a[2]}) > 0 THEN 1 ELSE -1 END, {a[2]})")


def _t_array_sort(a):
    if len(a) == 1:
        return f"sort_array({a[0]})"
    order = (_lit_str(a[1]) or "").lower()
    if order in ("asc", "desc"):
        return f"sort_array({a[0]}, {'true' if order == 'asc' else 'false'})"
    raise DialectError("array_sort: order must be an 'ASC'/'DESC' literal")


TEMPLATES: dict[str, object] = {
    "log": _t_log,
    "trunc": _t_trunc,
    "gcd": _t_gcd,
    "lcm": _t_lcm,
    "iszero": lambda a: f"(CAST({a[0]} AS DOUBLE) = 0.0)",
    "date_bin": _t_date_bin,
    "from_unixtime": lambda a: f"timestamp_seconds({a[0]})",
    "to_timestamp_nanos": lambda a: f"timestamp_micros(CAST(({a[0]}) / 1000 AS BIGINT))",
    "date_format": _t_fmt2("date_format"),
    "to_char": _t_fmt2("date_format"),
    "to_date": _t_fmt2("to_date"),
    "to_timestamp": _t_fmt2("to_timestamp"),
    "encode": _t_encode,
    "decode": _t_decode,
    "digest": _t_digest,
    "md5": lambda a: f"md5({a[0]})",
    "sha224": lambda a: f"unhex(sha2({a[0]}, 224))",
    "sha256": lambda a: f"unhex(sha2({a[0]}, 256))",
    "sha384": lambda a: f"unhex(sha2({a[0]}, 384))",
    "sha512": lambda a: f"unhex(sha2({a[0]}, 512))",
    "arrow_cast": _t_arrow_cast,
    "arrow_try_cast": lambda a: _t_arrow_cast(a, try_=True),
    "arrow_typeof": lambda a: f"typeof({a[0]})",
    "regexp_replace": _t_regexp_replace,
    "regexp_like": lambda a: (
        f"regexp_like({a[0]}, {a[1]})" if len(a) == 2
        else (f"regexp_like({a[0]}, '(?i)' || {a[1]})"
              if (_lit_str(a[2]) or "") == "i"
              else (_raise(DialectError("regexp_like: only the 'i' flag literal maps"))))),
    "string_agg": _t_string_agg,
    "approx_median": lambda a: f"percentile_approx({a[0]}, 0.5)",
    # arrays
    "range": _t_range,
    "array_sort": _t_array_sort,
    "list_sort": _t_array_sort,
    "array_empty": lambda a: f"(cardinality({a[0]}) = 0)",
    "list_empty": lambda a: f"(cardinality({a[0]}) = 0)",
    "empty": lambda a: f"(cardinality({a[0]}) = 0)",
    "array_dims": lambda a: f"array(cardinality({a[0]}))",       # flat arrays
    "list_dims": lambda a: f"array(cardinality({a[0]}))",
    "array_ndims": lambda a: f"IF(({a[0]}) IS NULL, NULL, 1)",   # flat arrays
    "list_ndims": lambda a: f"IF(({a[0]}) IS NULL, NULL, 1)",
    "array_first": lambda a: f"element_at({a[0]}, 1)",
    "list_first": lambda a: f"element_at({a[0]}, 1)",
    "array_any_value": lambda a: f"element_at(filter({a[0]}, x -> x IS NOT NULL), 1)",
    "list_any_value": lambda a: f"element_at(filter({a[0]}, x -> x IS NOT NULL), 1)",
    "array_pop_back": lambda a: f"slice({a[0]}, 1, greatest(cardinality({a[0]}) - 1, 0))",
    "list_pop_back": lambda a: f"slice({a[0]}, 1, greatest(cardinality({a[0]}) - 1, 0))",
    "array_pop_front": lambda a: f"slice({a[0]}, 2, greatest(cardinality({a[0]}) - 1, 0))",
    "list_pop_front": lambda a: f"slice({a[0]}, 2, greatest(cardinality({a[0]}) - 1, 0))",
    "array_slice": lambda a: f"slice({a[0]}, {a[1]}, ({a[2]}) - ({a[1]}) + 1)",
    "list_slice": lambda a: f"slice({a[0]}, {a[1]}, ({a[2]}) - ({a[1]}) + 1)",
    "array_has_all": lambda a: f"forall({a[1]}, x -> array_contains({a[0]}, x))",
    "list_has_all": lambda a: f"forall({a[1]}, x -> array_contains({a[0]}, x))",
    "array_positions": lambda a: (
        f"filter(transform({a[0]}, (x, i) ->"
        f" CASE WHEN x <=> ({a[1]}) THEN i + 1 END), p -> p IS NOT NULL)"),
    "list_positions": lambda a: (
        f"filter(transform({a[0]}, (x, i) ->"
        f" CASE WHEN x <=> ({a[1]}) THEN i + 1 END), p -> p IS NOT NULL)"),
    "array_remove": lambda a: (
        f"IF(array_position({a[0]}, {a[1]}) > 0,"
        f" concat(slice({a[0]}, 1, CAST(array_position({a[0]}, {a[1]}) AS INT) - 1),"
        f" slice({a[0]}, CAST(array_position({a[0]}, {a[1]}) AS INT) + 1,"
        f" cardinality({a[0]}))), {a[0]})"),
    "list_remove": lambda a: TEMPLATES["array_remove"](a),
    "array_replace": lambda a: (
        f"transform({a[0]}, (x, i) ->"
        f" IF(CAST(i + 1 AS BIGINT) = array_position({a[0]}, {a[1]}), {a[2]}, x))"),
    "list_replace": lambda a: TEMPLATES["array_replace"](a),
    "array_replace_all": lambda a: f"transform({a[0]}, x -> IF(x <=> ({a[1]}), {a[2]}, x))",
    "list_replace_all": lambda a: f"transform({a[0]}, x -> IF(x <=> ({a[1]}), {a[2]}, x))",
    "array_resize": lambda a: (
        f"IF(cardinality({a[0]}) >= ({a[1]}), slice({a[0]}, 1, {a[1]}),"
        f" concat({a[0]}, array_repeat({a[2] if len(a) > 2 else 'NULL'},"
        f" CAST(({a[1]}) - cardinality({a[0]}) AS INT))))"),
    "list_resize": lambda a: TEMPLATES["array_resize"](a),
    "array_scale": lambda a: f"transform({a[0]}, x -> x * ({a[1]}))",
    "list_scale": lambda a: f"transform({a[0]}, x -> x * ({a[1]}))",
    "array_add": lambda a: f"zip_with({a[0]}, {a[1]}, (x, y) -> x + y)",
    "list_add": lambda a: f"zip_with({a[0]}, {a[1]}, (x, y) -> x + y)",
    "array_subtract": lambda a: f"zip_with({a[0]}, {a[1]}, (x, y) -> x - y)",
    "list_subtract": lambda a: f"zip_with({a[0]}, {a[1]}, (x, y) -> x - y)",
    "array_sum": lambda a: f"aggregate({a[0]}, CAST(0 AS DOUBLE), (s, x) -> s + x)",
    "list_sum": lambda a: f"aggregate({a[0]}, CAST(0 AS DOUBLE), (s, x) -> s + x)",
    "array_product": lambda a: f"aggregate({a[0]}, CAST(1 AS DOUBLE), (s, x) -> s * x)",
    "list_product": lambda a: f"aggregate({a[0]}, CAST(1 AS DOUBLE), (s, x) -> s * x)",
    "array_avg": lambda a: (
        f"(aggregate(filter({a[0]}, x -> x IS NOT NULL), CAST(0 AS DOUBLE),"
        f" (s, x) -> s + x) / cardinality(filter({a[0]}, x -> x IS NOT NULL)))"),
    "list_avg": lambda a: TEMPLATES["array_avg"](a),
    "dot_product": lambda a: (
        f"aggregate(zip_with({a[0]}, {a[1]}, (x, y) -> CAST(x AS DOUBLE) * y),"
        f" CAST(0 AS DOUBLE), (s, v) -> s + v)"),
    "inner_product": lambda a: TEMPLATES["dot_product"](a),
    "array_distance": lambda a: (
        f"sqrt(aggregate(zip_with({a[0]}, {a[1]},"
        f" (x, y) -> CAST(x - y AS DOUBLE) * (x - y)), CAST(0 AS DOUBLE), (s, v) -> s + v))"),
    "list_distance": lambda a: TEMPLATES["array_distance"](a),
    "cosine_distance": lambda a: (
        f"(1.0 - aggregate(zip_with({a[0]}, {a[1]}, (x, y) -> CAST(x AS DOUBLE) * y),"
        f" CAST(0 AS DOUBLE), (s, v) -> s + v)"
        f" / (sqrt(aggregate({a[0]}, CAST(0 AS DOUBLE), (s, x) -> s + CAST(x AS DOUBLE) * x))"
        f" * sqrt(aggregate({a[1]}, CAST(0 AS DOUBLE), (s, x) -> s + CAST(x AS DOUBLE) * x))))"),
    "array_normalize": lambda a: (
        f"transform({a[0]}, v -> CAST(v AS DOUBLE) /"
        f" sqrt(aggregate({a[0]}, CAST(0 AS DOUBLE), (s, x) -> s + CAST(x AS DOUBLE) * x)))"),
    "list_normalize": lambda a: TEMPLATES["array_normalize"](a),
    "map_extract": lambda a: f"array(element_at({a[0]}, {a[1]}))",
}

_ALL = set(RENAMES) | set(TEMPLATES) | set(UNSUPPORTED)

# ---------------------------------------------------------------------------
# Scanner.
# ---------------------------------------------------------------------------

_IDENT0 = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_")


def _skip_quoted(s: str, i: int, q: str) -> int:
    """Index just past a quoted section starting at s[i] == q (doubled-quote
    escapes honoured)."""
    i += 1
    n = len(s)
    while i < n:
        if s[i] == q:
            if i + 1 < n and s[i + 1] == q:
                i += 2
                continue
            return i + 1
        i += 1
    return n


def _parse_args(s: str, i: int) -> tuple[list[str], int]:
    """Parse a balanced ``( ... )`` starting at s[i] == '('; returns the
    top-level comma-split argument texts and the index just past ')'."""
    assert s[i] == "("
    depth, j, args, start = 0, i, [], i + 1
    n = len(s)
    while j < n:
        c = s[j]
        if c in "'\"`":
            j = _skip_quoted(s, j, c)
            continue
        if s.startswith("--", j):
            j = s.find("\n", j)
            j = n if j < 0 else j
            continue
        if s.startswith("/*", j):
            j = s.find("*/", j)
            j = n if j < 0 else j + 2
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
            if depth == 0:
                args.append(s[start:j])
                return ([a for a in args] if any(a.strip() for a in args) else []), j + 1
        elif c == "," and depth == 1:
            args.append(s[start:j])
            start = j + 1
        j += 1
    raise DialectError("unbalanced parentheses in SQL")


# ---------------------------------------------------------------------------
# Statement-level rewrites (run before function rewriting).
# ---------------------------------------------------------------------------

_EXT_TABLE_RE = re.compile(
    r"(?is)^\s*CREATE\s+(?:UNBOUNDED\s+)?EXTERNAL\s+TABLE\s+"
    r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.\"`]+)\s*"
    r"(?P<cols>\([^)]*\)\s*)?"
    r"STORED\s+AS\s+(?P<fmt>\w+)\s*"
    r"(?P<header>WITH\s+HEADER\s+ROW\s*)?"
    r"(?P<part>PARTITIONED\s+BY\s*\([^)]*\)\s*)?"
    r"LOCATION\s+(?P<loc>'[^']+')\s*;?\s*$")

_EXT_FORMATS = {"parquet": "parquet", "csv": "csv", "json": "json",
                "ndjson": "json", "orc": "orc", "avro": "avro"}


def _rewrite_statement(sql: str) -> str:
    """DDL/clause-level dialect differences that aren't function calls."""
    m = _EXT_TABLE_RE.match(sql)
    if m:
        fmt = _EXT_FORMATS.get(m.group("fmt").lower())
        if fmt is None:
            raise DialectError(
                f"CREATE EXTERNAL TABLE: unsupported format {m.group('fmt')!r}")
        parts = ["CREATE TABLE ", m.group("ine") or "", m.group("name"), " ",
                 (m.group("cols") or "").strip() + (" " if m.group("cols") else ""),
                 f"USING {fmt} "]
        if m.group("header"):
            parts.append("OPTIONS (header 'true') ")
        if m.group("part"):
            parts.append(m.group("part").strip() + " ")
        parts.append(f"LOCATION {m.group('loc')}")
        return "".join(parts)
    # SELECT * EXCLUDE (a, b) / EXCLUDE a  →  Spark's * EXCEPT (a, b)
    def _exclude(m2: re.Match) -> str:
        body = m2.group("body")
        if body.lstrip().startswith("("):
            return f"{m2.group('star')} EXCEPT {body}"
        ident = body.strip()
        return f"{m2.group('star')} EXCEPT ({ident})"

    sql = re.sub(
        r"(?is)(?P<star>\*)\s+EXCLUDE\s*(?P<body>\([^)]*\)|[\w\"`]+)",
        _exclude, sql)
    # QUALIFY (reference sqllogictest qualify.slt): filter on window results.
    # Spark has no QUALIFY clause — rewrite into a subquery that computes the
    # predicate as a boolean column, then filter in the outer SELECT.
    if _word_outside_literals(sql, "qualify"):
        sql = _rewrite_qualify(sql)
    return sql


def _iter_top_tokens(sql: str, start: int = 0):
    """Yield ``(begin, end, lower_word)`` for identifier tokens at paren
    depth 0, skipping string literals, quoted identifiers and comments."""
    i, n, depth = start, len(sql), 0
    while i < n:
        c = sql[i]
        if c in "'\"`":
            i = _skip_quoted(sql, i, c)
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j
        elif sql.startswith("/*", i):
            j = sql.find("*/", i)
            i = n if j < 0 else j + 2
        elif c in "([":
            depth += 1
            i += 1
        elif c in ")]":
            depth -= 1
            i += 1
        elif c in _IDENT0:
            j = i
            while j < n and (sql[j] in _IDENT0 or sql[j].isdigit()):
                j += 1
            if depth == 0:
                yield (i, j, sql[i:j].lower())
            i = j
        else:
            i += 1


def _split_top_commas(s: str) -> list[str]:
    """Split on commas at paren depth 0 (literal/comment aware)."""
    parts, start, i, n, depth = [], 0, 0, len(s), 0
    while i < n:
        c = s[i]
        if c in "'\"`":
            i = _skip_quoted(s, i, c)
            continue
        if s.startswith("--", i):
            j = s.find("\n", i)
            i = n if j < 0 else j
            continue
        if s.startswith("/*", i):
            j = s.find("*/", i)
            i = n if j < 0 else j + 2
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return parts


def _subst_aliases(pred: str, aliases: dict[str, str]) -> str:
    """Replace bare references to select-list aliases in ``pred`` with the
    aliased expression (parenthesised).  Skips literals, qualified names
    (``t.x``) and function calls (``x(``)."""
    out: list[str] = []
    i, n = 0, len(pred)
    while i < n:
        c = pred[i]
        if c in "'\"`":
            j = _skip_quoted(pred, i, c)
            out.append(pred[i:j])
            i = j
        elif c in _IDENT0:
            j = i
            while j < n and (pred[j] in _IDENT0 or pred[j].isdigit()):
                j += 1
            word = pred[i:j]
            k = j
            while k < n and pred[k].isspace():
                k += 1
            qualified = (i > 0 and pred[i - 1] == ".") or (k < n and pred[k] in ".(")
            if not qualified and word.lower() in aliases:
                out.append(f"({aliases[word.lower()]})")
            else:
                out.append(word)
            i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)


_QUALIFY_TERMINATORS = {"order", "limit", "offset", "union",
                        "intersect", "except", "window"}

_TAIL_KEYWORDS = {
    "order", "by", "asc", "desc", "nulls", "first", "last", "limit",
    "offset", "and", "or", "not", "in", "is", "null", "true", "false",
    "case", "when", "then", "else", "end", "between", "like", "ilike",
    "escape", "all", "distinct", "interval", "cast", "as",
    # type names, so CAST(x AS INT) inside an ORDER BY expression doesn't
    # read INT as a column (the tail scan descends into parens)
    "int", "integer", "bigint", "smallint", "tinyint", "double", "float",
    "decimal", "numeric", "real", "varchar", "string", "char", "text",
    "date", "timestamp", "boolean", "binary",
}


def _iter_tail_tokens(sql: str):
    """Like _iter_top_tokens but yields identifier tokens at EVERY paren
    depth — a post-QUALIFY ORDER BY may sort by an expression over a
    non-projected column (e.g. ``ORDER BY upper(nm)``), and ``nm`` sits at
    depth 1."""
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"`":
            i = _skip_quoted(sql, i, c)
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j
        elif sql.startswith("/*", i):
            j = sql.find("*/", i)
            i = n if j < 0 else j + 2
        elif c in _IDENT0:
            j = i
            while j < n and (sql[j] in _IDENT0 or sql[j].isdigit()):
                j += 1
            yield (i, j, sql[i:j].lower())
            i = j
        else:
            i += 1


def _tail_extra_cols(tail: str, visible: set[str]) -> list[str]:
    """Bare column identifiers the post-QUALIFY tail (ORDER BY …) references
    that the select list does not expose — they must be projected through the
    rewrite subquery (then EXCEPTed back out) for the outer sort to resolve,
    matching SQL's sort-by-underlying-column rule.  Descends into
    parenthesized expressions (``ORDER BY upper(nm)`` must carry ``nm``
    through the rewrite subquery too)."""
    extras: list[str] = []
    n = len(tail)
    prev = ""
    for a, b, w in _iter_tail_tokens(tail):
        skip_after = prev
        prev = w
        if skip_after == "as":
            continue  # CAST(x AS <typename>) — never a column
        if w in _TAIL_KEYWORDS or w in visible or w in {e.lower() for e in extras}:
            continue
        if a > 0 and tail[a - 1] == ".":
            continue  # qualified name's trailing part: t.x handled via x
        k = b
        while k < n and tail[k].isspace():
            k += 1
        if k < n and tail[k] in "(.":
            continue  # function call or table qualifier
        extras.append(tail[a:b])
    return extras


def _rewrite_qualify(sql: str) -> str:
    """``SELECT … QUALIFY pred [ORDER BY …]`` →

    ``SELECT * EXCEPT (__qualify__) FROM (SELECT …, (pred') AS __qualify__
    …) __qualify_sq WHERE __qualify__ [ORDER BY …]``

    where pred' has select-list aliases substituted with their expressions
    (so window/aggregate aliases are computed in the inner scope, exactly the
    evaluation order the reference's qualify.slt specifies).  Handles WITH
    CTEs (their bodies sit inside parens, below the depth-0 scan).  Refuses
    set operations and nested QUALIFY rather than mis-scoping."""
    toks = list(_iter_top_tokens(sql))
    qpos = [(a, b) for a, b, w in toks if w == "qualify"]
    if not qpos:
        raise DialectError(
            "QUALIFY inside a subquery: rewrite the inner query with a"
            " windowed boolean column and filter in its outer SELECT")
    if len(qpos) > 1:
        raise DialectError("multiple QUALIFY clauses in one statement")
    if any(w in ("union", "intersect", "except") for a, b, w in toks
           if a < qpos[0][0]):
        raise DialectError(
            "QUALIFY after a set operation: wrap the set operation in a"
            " subquery first (predicate scope would be ambiguous)")
    qa, qb = qpos[0]
    head, rest = sql[:qa], sql[qb:]
    trailing = ";" if sql.rstrip().endswith(";") else ""
    term = next((a for a, b, w in _iter_top_tokens(rest)
                 if w in _QUALIFY_TERMINATORS), None)
    pred = (rest if term is None else rest[:term]).strip().rstrip(";").strip()
    tail = ("" if term is None else rest[term:]).strip().rstrip(";").strip()
    if not pred:
        raise DialectError("QUALIFY with an empty predicate")
    htoks = list(_iter_top_tokens(head))
    sels = [t for t in htoks if t[2] == "select"]
    if not sels:
        raise DialectError("QUALIFY without a top-level SELECT")
    _, sel_end, _ = sels[-1]
    from_t = next((t for t in htoks if t[2] == "from" and t[0] > sel_end), None)
    if from_t is None:
        raise DialectError("QUALIFY without a FROM clause")
    select_list = head[sel_end:from_t[0]]
    body = re.sub(r"(?is)^\s*(distinct|all)\b", "", select_list)
    aliases: dict[str, str] = {}
    for item in _split_top_commas(body):
        m = re.search(r"(?is)\s+as\s+([A-Za-z_]\w*)\s*$", item)
        if m:
            aliases[m.group(1).lower()] = item[:m.start()].strip()
    pred = _subst_aliases(pred, aliases)
    if not re.search(r"(?is)\bover\s*\(", pred) and \
            not re.search(r"(?is)\bover\s*\(", select_list):
        # Reference parity: DataFusion rejects QUALIFY with no window
        # function in the predicate or projection (qualify.slt error case).
        raise DialectError("QUALIFY requires a window function")
    # Column names the outer query can already resolve from the select list:
    # aliases plus plain column items (`x` / `t.x`).  A `*` exposes every
    # base column, so nothing extra is ever needed.
    visible = set(aliases)
    star = False
    for item in _split_top_commas(body):
        it = item.strip()
        if it == "*" or it.endswith(".*"):
            star = True
        elif re.fullmatch(r"[\w.\"`]+", it):
            visible.add(it.rsplit(".", 1)[-1].strip('"`').lower())
    extras = [] if star else _tail_extra_cols(tail, visible)
    extra_sel = "".join(f", {e}" for e in extras)
    except_list = ", ".join(["__qualify__", *extras])
    inner = (head[:from_t[0]].rstrip()
             + f"{extra_sel}, ({pred}) AS __qualify__ "
             + head[from_t[0]:].strip())
    out = (f"SELECT * EXCEPT ({except_list}) FROM (" + inner
           + ") __qualify_sq WHERE __qualify__")
    if tail:
        out += " " + tail
    return out + trailing


def _word_outside_literals(sql: str, word: str) -> bool:
    i, n = 0, len(sql)
    wl = len(word)
    while i < n:
        c = sql[i]
        if c in "'\"`":
            i = _skip_quoted(sql, i, c)
        elif sql[i:i + wl].lower() == word and \
                (i == 0 or not (sql[i - 1] in _IDENT0 or sql[i - 1].isdigit())) and \
                (i + wl >= n or not (sql[i + wl] in _IDENT0 or sql[i + wl].isdigit())):
            return True
        else:
            i += 1
    return False


def translate_sql(sql: str) -> str:
    """Rewrite DataFusion-dialect SQL into Spark SQL (see module docs)."""
    sql = _rewrite_statement(sql)
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"`":
            j = _skip_quoted(sql, i, c)
            out.append(sql[i:j])
            i = j
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            j = n if j < 0 else j
            out.append(sql[i:j])
            i = j
        elif sql.startswith("/*", i):
            j = sql.find("*/", i)
            j = n if j < 0 else j + 2
            out.append(sql[i:j])
            i = j
        elif c in _IDENT0:
            j = i
            while j < n and (sql[j] in _IDENT0 or sql[j].isdigit()):
                j += 1
            word = sql[i:j]
            lw = word.lower()
            k = j
            while k < n and sql[k].isspace():
                k += 1
            if k < n and sql[k] == "(" and lw in _ALL:
                if lw in UNSUPPORTED:
                    raise DialectError(f"{lw}: {UNSUPPORTED[lw]}")
                raw_args, close = _parse_args(sql, k)
                targs = [translate_sql(a).strip() for a in raw_args]
                if lw in TEMPLATES:
                    out.append(TEMPLATES[lw](targs))
                else:
                    out.append(f"{RENAMES[lw]}({', '.join(targs)})")
                i = close
            else:
                out.append(word)
                i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)
