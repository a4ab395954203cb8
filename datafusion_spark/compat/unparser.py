"""Plan → SQL unparser: DataFrame logical plans back to SQL text.

Mirrors the reference's ``datafusion/sql/src/unparser/`` (plan.rs:
plan_to_sql walking LogicalPlan and assembling a SELECT query block;
expr.rs: expr_to_sql; dialect.rs: per-target-engine knobs — identifier
quote style, limit clause style, what refuses).  That surface is what a
DataFusion embedder uses for federation/pushdown: take an optimized
plan fragment and ship it to a remote engine as SQL text.

Spark-first design: Catalyst expressions already know how to render
themselves as SQL (``Expression.sql`` — the same mechanism ``df
.selectExpr`` round-trips through), so unlike the reference's expr.rs
we never hand-unparse expression trees.  This module only unparses the
PLAN STRUCTURE — Project/Filter/Aggregate/Sort/Limit/Join/Union/
Distinct/Window/relations — assembling query blocks bottom-up exactly
like plan.rs does (select/from/where accumulate into one block until a
clause slot is already occupied, then the block flushes into a derived
table, reference plan.rs derive_table_with_alias).

Non-unparsable plans refuse with ``DialectError`` carrying the node
class name, mirroring the reference's ``unsupported plan`` errors.

Round-trip contract (validated by ``compat_unparser_roundtrip`` and
tests/test_unparser.py): ``spark.sql(to_sql(df))`` produces the same
rows as ``df`` itself.
"""

from __future__ import annotations

import os
import re

from dataclasses import dataclass, field

from datafusion_spark.compat.dialect import DialectError


@dataclass(frozen=True)
class Dialect:
    """Target-engine knobs (reference unparser/dialect.rs).

    identifier_quote: what Catalyst's backtick-quoted identifiers are
        re-quoted to ('`' = leave as Spark emits them).
    file_table_style: how a file-backed relation is named —
        'spark' → ``parquet.`/path```  (Spark SQL direct-file syntax)
        'duckdb' → ``read_parquet('/path/**/*.parquet')``
        'none' → refuse file relations (engines needing catalog names).
    supports_semi_anti_join: LEFT SEMI/ANTI JOIN keywords allowed.
    semi_anti_keyword: spelling of the semi/anti join keywords —
        'spark' → LEFT SEMI JOIN / LEFT ANTI JOIN
        'duckdb' → SEMI JOIN / ANTI JOIN (DuckDB >= 0.8 syntax)
    """

    name: str = "spark"
    identifier_quote: str = "`"
    file_table_style: str = "spark"
    supports_semi_anti_join: bool = True
    semi_anti_keyword: str = "spark"


SPARK = Dialect()
ANSI = Dialect(name="ansi", identifier_quote='"', file_table_style="none",
               supports_semi_anti_join=False)
DUCKDB = Dialect(name="duckdb", identifier_quote='"',
                 file_table_style="duckdb", supports_semi_anti_join=True,
                 semi_anti_keyword="duckdb")


def _requote(sql: str, quote: str) -> str:
    """Re-quote Catalyst's backtick identifiers for another dialect.

    Walks the text tracking single-quoted string literals so a backtick
    inside a string is never touched.  Escaped backticks inside an
    identifier (``````) are refused — no portable rendering.
    """
    if quote == "`":
        return sql
    out, i, n, in_str = [], 0, len(sql), False
    while i < n:
        ch = sql[i]
        if in_str:
            out.append(ch)
            if ch == "\\" and i + 1 < n:
                # Catalyst C-style escape (\' / \\): next char is literal
                out.append(sql[i + 1])
                i += 1
            elif ch == "'":
                # '' escape stays inside the literal
                if i + 1 < n and sql[i + 1] == "'":
                    out.append("'")
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
            out.append(ch)
        elif ch == "`":
            # Scan to the closing backtick, honouring Catalyst's ``
            # escape for a literal backtick INSIDE the identifier — the
            # first find() would otherwise stop at the escape and split
            # the identifier (r8 review find: alias 'x`y' silently became
            # "x""y").  Escaped backticks are refused: no portable
            # rendering in a non-backtick dialect.
            j = i + 1
            while True:
                j = sql.find("`", j)
                if j < 0:
                    raise DialectError(
                        "unterminated identifier quote in: " + sql)
                if j + 1 < n and sql[j + 1] == "`":
                    raise DialectError(
                        f"identifier containing a backtick in {sql[i:j+2]!r}"
                        f" is not representable in a {quote}-quoted dialect")
                break
            ident = sql[i + 1:j]
            if quote in ident:
                raise DialectError(
                    f"identifier {ident!r} not representable in "
                    f"{quote}-quoted dialect")
            out.append(quote + ident + quote)
            i = j
        else:
            out.append(ch)
        i += 1
    return "".join(out)


@dataclass
class _Block:
    """One SELECT query block being assembled (reference plan.rs
    QueryBuilder/SelectBuilder).  ``from_ is None`` = a FROM-less
    one-row SELECT (Catalyst OneRowRelation)."""

    from_: str | None
    select: list[str] | None = None
    distinct: bool = False
    where: list[str] = field(default_factory=list)
    group_by: list[str] | None = None
    # Only set by the DUCKDB grouping-sets render (the empty-input
    # parity guard); Catalyst HAVING arrives as a Filter node and stays
    # a derived-table WHERE.
    having: str | None = None
    order_by: list[str] | None = None
    limit: str | None = None
    offset: str | None = None
    # USING-join blocks: the Join node's OWN output rendered as a select
    # list.  `SELECT *` over JOIN ... USING dedups and reorders the key
    # column, so a block that reaches the query ROOT with select still
    # None must materialize this list to keep the emitted schema equal to
    # node.output() (r9 advice find).  Parent clauses that set select
    # re-project anyway, so this only matters at the root.
    using_out: list[str] | None = None

    def render(self) -> str:
        sel = ", ".join(self.select) if self.select else "*"
        parts = [f"SELECT {'DISTINCT ' if self.distinct else ''}{sel}"]
        if self.from_ is not None:
            parts.append(f"FROM {self.from_}")
        if self.where:
            parts.append("WHERE " + " AND ".join(self.where))
        if self.group_by:
            parts.append("GROUP BY " + ", ".join(self.group_by))
        if self.having is not None:
            parts.append("HAVING " + self.having)
        if self.order_by:
            parts.append("ORDER BY " + ", ".join(self.order_by))
        if self.limit is not None:
            parts.append("LIMIT " + self.limit)
        if self.offset is not None:
            parts.append("OFFSET " + self.offset)
        return " ".join(parts)


import re as _re_mod

# Catalyst renders typed numeric literals with Spark-only suffixes
# (5Y/5S/5L/0.05D/1.50BD).  Other dialects spell the same type with a
# CAST; the decimal suffix carries Spark's literal typing rule
# (precision = significant digits, scale = fraction digits), which the
# rewrite reproduces so the remote engine computes in the same type.
_SUFFIX_RE = _re_mod.compile(
    r'(?<![\w."])(\d+(?:\.\d*)?(?:[eE][-+]?\d+)?)(BD|[YSLD])\b')
_SUFFIX_TYPE = {"Y": "TINYINT", "S": "SMALLINT", "L": "BIGINT",
                "D": "DOUBLE"}
# Type-MIN literals whose magnitude overflows the type: the minus sign
# is provably PART of the literal (Catalyst could never render the bare
# positive 9223372036854775808L as a BIGINT subtraction operand), so it
# must move inside the CAST — `-CAST(9223372036854775808 AS BIGINT)`
# makes the inner positive value overflow at a remote binder (DuckDB
# reads it as INT128 and the cast errors; found by the sweep's
# execution pass on fn_edge_in_list_typed).
# The two fixed-width lookbehinds anchor the minus against a preceding
# operand (identifier / closing paren / quote, with or without one
# space) so the rewrite can never consume a BINARY minus — today a
# positive boundary magnitude cannot render as a suffixed literal, but
# that invariant lives in Catalyst, not here.
_NEG_BOUNDARY_RE = _re_mod.compile(
    r"(?<![\w.)\"'])(?<![\w.)\"'] )"
    r"-\s?(?:(9223372036854775808)L|(32768)S|(128)Y)\b")


def _neg_boundary(seg: str) -> str:
    return _NEG_BOUNDARY_RE.sub(
        lambda m: (f"CAST(-{m.group(1)} AS BIGINT)" if m.group(1)
                   else f"CAST(-{m.group(2)} AS SMALLINT)" if m.group(2)
                   else f"CAST(-{m.group(3)} AS TINYINT)"), seg)


def _strip_literal_suffixes(txt: str) -> str:
    """Rewrite Spark literal suffixes to CASTs for non-Spark dialects,
    protecting single-quoted strings AND double-quoted identifiers (the
    non-backtick dialects quote identifiers with ``\"``)."""

    def repl(m: "_re_mod.Match[str]") -> str:
        num, suf = m.group(1), m.group(2)
        if suf != "BD":
            return f"CAST({num} AS {_SUFFIX_TYPE[suf]})"
        if "e" in num.lower():
            return m.group(0)  # exponent decimals: no portable spelling
        digits = num.replace(".", "")
        scale = len(num.split(".")[1]) if "." in num else 0
        prec = max(len(digits.lstrip("0")) or 1, scale)
        return f"CAST({num} AS DECIMAL({prec},{scale}))"

    out: list[str] = []
    buf: list[str] = []
    i, n = 0, len(txt)
    quote: str | None = None
    while i < n:
        ch = txt[i]
        if quote is not None:
            buf.append(ch)
            if ch == quote:
                if i + 1 < n and txt[i + 1] == quote:
                    buf.append(txt[i + 1])
                    i += 1
                else:
                    out.append("".join(buf))
                    buf, quote = [], None
        elif ch in ("'", '"'):
            out.append(_SUFFIX_RE.sub(repl, _neg_boundary("".join(buf))))
            buf, quote = [ch], ch
        else:
            buf.append(ch)
        i += 1
    if buf:
        seg = "".join(buf)
        out.append(seg if quote is not None
                   else _SUFFIX_RE.sub(repl, _neg_boundary(seg)))
    return "".join(out)


# Function-spelling rules for the DuckDB dialect (reference
# unparser/dialect.rs does exactly this per-target function mapping).
# Only functions whose DuckDB namesake has DIFFERENT SEMANTICS are
# listed — the silent-divergence class; a function DuckDB simply lacks
# fails loudly at the remote binder, which the contract allows.
#   cast X      — Spark fn(arg) ≡ CAST(arg AS X) in DuckDB (DuckDB's own
#                 to_timestamp takes EPOCH SECONDS, not a string).
#   ln_if_unary — DuckDB log(x) is log BASE 10; Spark's is ln.  Two-arg
#                 log(base, x) agrees in both.
#   append_arg  — DuckDB regexp_replace replaces the FIRST match unless
#                 the 'g' flag is passed; Spark replaces all.
#   refuse      — no faithful DuckDB spelling (different no-match/sketch
#                 semantics, or execution-dependent value).
# Catalyst INTERNAL function spellings that Expression.sql emits but the
# parser does not accept back (found by the registry sweep as re-analyze
# refusals): ANSI-interval field extraction renders as
# extractansiintervaldays(x) while the parseable spelling is
# EXTRACT(DAY FROM x).  The rewrite restores the public spelling — the
# re-analysis lowers it to the identical expression.
_CATALYST_INTERNAL_FN_RULES: dict[str, tuple[str, str | None]] = {
    # nullability HINT wrappers: value-identical no-ops whose rendering
    # never re-parses; the re-analysis recomputes nullability itself
    "knownnullable": ("template", "{inner}"),
    "knownnotnull": ("template", "{inner}"),
    "knownfloatingpointnormalized": ("template", "{inner}"),
    # the time-window Expand lowering's internal micros conversion: the
    # original window(ts, ...) call is not reconstructible from the
    # lowered projections — clean refusal instead of a reparse error
    "precisetimestampconversion": ("refuse", None),
    "extractansiintervalyears": ("template", "extract(YEAR FROM {inner})"),
    "extractansiintervalmonths": ("template", "extract(MONTH FROM {inner})"),
    "extractansiintervaldays": ("template", "extract(DAY FROM {inner})"),
    "extractansiintervalhours": ("template", "extract(HOUR FROM {inner})"),
    "extractansiintervalminutes": ("template",
                                   "extract(MINUTE FROM {inner})"),
    "extractansiintervalseconds": ("template",
                                   "extract(SECOND FROM {inner})"),
}

_DUCKDB_FN_RULES: dict[str, tuple[str, str | None]] = {
    "to_timestamp": ("cast", "TIMESTAMP"),
    "to_date": ("cast", "DATE"),
    "log": ("ln_if_unary", None),
    # day-of-week NUMBERING differs: DuckDB weekday/dayofweek are
    # Sunday=0..6, Spark weekday is Monday=0..6 (= isodow-1) and Spark
    # dayofweek is Sunday=1..7 (found by the DuckDB-execution pass)
    "weekday": ("template", "(isodow({inner}) - 1)"),
    "dayofweek": ("template", "(dayofweek({inner}) + 1)"),
    # name ABBREVIATION differs: Spark monthname/dayname return 'Jan'/
    # 'Mon', DuckDB's namesakes return 'January'/'Monday'
    "monthname": ("template", "strftime({inner}, '%b')"),
    "dayname": ("template", "strftime({inner}, '%a')"),
    # estimator DEFINITIONS differ (the fuzz axis-17 class): Spark
    # skewness/kurtosis are population g1/g2, DuckDB's are the
    # sample-adjusted estimators — silently different values
    "skewness": ("refuse", None),
    "kurtosis": ("refuse", None),
    # reserved-word/function-spelling translations (loud parse or
    # catalog errors otherwise; semantics identical after the rewrite)
    "between": ("template_args", ("({0} BETWEEN {1} AND {2})", 3)),
    "ilike": ("template_args", ("({0} ILIKE {1})", 2)),
    # DuckDB array_to_string([]) is NULL where Spark array_join([]) is
    # '' (exec-pass find on fn_regexp_extract_all's no-match arrays);
    # NULL input must STAY NULL, so the empty-list patch is guarded
    "array_join": ("template_args",
                   ("CASE WHEN ({0}) IS NULL THEN NULL ELSE "
                    "COALESCE(array_to_string({0}, {1}), '') END", 2)),
    # Spark unix_timestamp renders with an explicit format even for the
    # 1-arg call ('yyyy-MM-dd HH:mm:ss' default); the handler maps the
    # Java pattern tokens to strptime and floors the epoch (Spark
    # returns whole BIGINT seconds) — r11, recovered the ClickBench
    # family.  Untranslatable format tokens refuse.
    "unix_timestamp": ("custom", lambda n, i: _h_unix_timestamp(n, i)),
    # regex PATTERN DIALECTS differ (Java regex vs RE2): translations
    # are gated on _require_safe_regex — a LITERAL pattern free of the
    # Java-only constructs (lookaround, backrefs, \Q..\E, possessive
    # quantifiers, class intersection) matches identically in RE2
    # (r11; each probed in DuckDB, exec-pass value-compared).
    # Non-literal or Java-only patterns refuse.  regexp_replace keeps
    # its 'g'-flag translation: RE2 errors loudly on the Java-only
    # constructs instead of mismatching.
    "regexp_extract": ("custom",
                       lambda n, i: _h_regexp_extract(n, i)),
    "regexp_extract_all": ("custom",
                           lambda n, i: _h_regexp_extract(n, i)),
    "rlike": ("custom", lambda n, i: _h_rlike(n, i)),
    "regexp_like": ("custom", lambda n, i: _h_rlike(n, i)),
    "regexp": ("custom", lambda n, i: _h_rlike(n, i)),
    # regexp_count translates in the r12 batch (len ∘ regexp_extract_all)
    "regexp_instr": ("refuse", None),
    "regexp_substr": ("custom", lambda n, i: _h_regexp_substr(n, i)),
    "left": ("custom", lambda n, i: _h_left_right(n, i)),
    "right": ("custom", lambda n, i: _h_left_right(n, i)),
    "substring": ("custom", lambda n, i: _h_substring(n, i)),
    "substr": ("custom", lambda n, i: _h_substring(n, i)),
    "lpad": ("custom", lambda n, i: _h_pad(n, i)),
    "rpad": ("custom", lambda n, i: _h_pad(n, i)),
    "upper": ("custom", lambda n, i: _h_case_fold(n, i)),
    "lower": ("custom", lambda n, i: _h_case_fold(n, i)),
    "ucase": ("custom", lambda n, i: _h_case_fold(n, i)),
    "lcase": ("custom", lambda n, i: _h_case_fold(n, i)),
    # axis-27 find: DuckDB levenshtein counts BYTES, Spark CODE POINTS
    # (7 vs 13 on a surrogate-pair emoji string) — same non-ASCII gate;
    # ASCII arguments are byte == code point and agree exactly
    "levenshtein": ("custom", lambda n, i: _h_case_fold(n, i)),
    # Spark split is REGEX-based with a limit; limit -1 (the default
    # render) maps to string_split for metacharacter-free literal
    # patterns and string_split_regex for safe regexes (both keep
    # trailing empties exactly like Spark — probed).
    "split": ("custom", lambda n, i: _h_split(n, i)),
    "approx_count_distinct": ("refuse", None),  # different sketch
    "spark_partition_id": ("refuse", None),     # execution-dependent
    # DuckDB 1.0 has no array_union; list_distinct(list_concat(..))
    # does NOT preserve Spark's first-occurrence order (probed:
    # list_distinct([3,1,3,2,1]) = [2,1,3]) — no faithful spelling
    "array_union": ("refuse", None),
    # DuckDB reads filenames via read_parquet(filename=true) columns,
    # not a scalar function — no faithful spelling (exec-pass find)
    "input_file_name": ("refuse", None),
    # Catalyst renders UnaryMinus as negative(x); DuckDB has no such
    # function (exec-pass find via the lateral-unnest batch)
    "negative": ("template", "(-({inner}))"),
    # no DuckDB analog (sketch function) — exec-pass find
    "approx_top_k": ("refuse", None),
    # DuckDB list_zip names struct fields list_1/list_2 where Spark
    # arrays_zip carries the INPUT column names — silent nested-schema
    # drift, no faithful spelling
    "arrays_zip": ("refuse", None),
    # Spark sequence(a, b) auto-descends when a > b; DuckDB
    # generate_series(a, b) silently returns [] there — only the
    # explicit-step arity translates unconditionally, the 2-arg form
    # only when both bounds are literals proving the direction
    "sequence": ("custom", lambda n, i: _h_sequence(n, i)),
}


def _h_sequence(name, inner):
    a = _split_top_args(inner)
    if len(a) == 3:
        return f"generate_series({a[0]}, {a[1]}, {a[2]})"
    if len(a) == 2:
        lits = [_re_mod.match(r"^-?\d+$", x) for x in a]
        if all(lits):
            if int(a[0]) <= int(a[1]):
                return f"generate_series({a[0]}, {a[1]})"
            return f"generate_series({a[0]}, {a[1]}, -1)"
        # non-literal bounds (r12): Spark sequence(a, b) auto-descends
        # with step -1 when a > b, where DuckDB generate_series(a, b)
        # silently returns [] — spell the direction with a CASE (probed:
        # both arms unify to the same list type, descending series
        # exact).  Bounds are CAST to BIGINT because DuckDB widens
        # sum()/cumulative-window operands to HUGEINT, which has no
        # generate_series overload (sweep execerr on
        # text_pack_assembly); Spark's operands are at most BIGINT so
        # the cast is value-preserving, and a date/interval operand
        # still fails the DuckDB binder LOUDLY, never silently.
        lo = f"CAST({a[0]} AS BIGINT)"
        hi = f"CAST({a[1]} AS BIGINT)"
        return (f"(CASE WHEN ({lo}) <= ({hi}) THEN "
                f"generate_series({lo}, {hi}) "
                f"ELSE generate_series({lo}, {hi}, -1) END)")
    raise DialectError(f"{len(a)}-arg sequence() — not unparsable")


# Java-only regex constructs that RE2 either rejects loudly (fine) or —
# the dangerous class — silently interprets differently: lookaround,
# numbered backrefs, \Q..\E quoting, \G, named backrefs, char-class
# intersection (&&), and possessive quantifiers.
_REGEX_UNSAFE = _re_mod.compile(
    r"\(\?<[=!]|\(\?[=!]|\\[0-9]|\\Q|\\E|\\G|\\k<|&&|[*+?}]\+")


def _require_safe_regex(arg: str, fn: str) -> str:
    """``arg`` must be a rendered string LITERAL whose unescaped pattern
    is free of Java-only regex constructs; returns the unescaped
    pattern.  Catalyst renders literal backslashes doubled, so a lone
    backslash escape other than \\\\ or \\' is unknown — refuse."""
    m = _re_mod.match(r"^'((?:[^'\\]|\\.)*)'$", arg)
    if m is None:
        raise DialectError(
            f"{fn}() pattern is not a plain literal — not unparsable")
    raw = m.group(1)
    out, i = [], 0
    while i < len(raw):
        if raw[i] == "\\":
            if i + 1 < len(raw) and raw[i + 1] in ("\\", "'", '"'):
                out.append(raw[i + 1])
                i += 2
                continue
            raise DialectError(
                f"{fn}() pattern escape not translatable: {raw[i:i+2]}")
        out.append(raw[i])
        i += 1
    pat = "".join(out)
    if _REGEX_UNSAFE.search(pat):
        raise DialectError(
            f"{fn}() pattern uses Java-only regex constructs — "
            "not unparsable")
    # Java's '$' (and '\Z') match BEFORE a final line terminator —
    # 'abc$' finds 'abc' in 'abc\n' — while RE2 matches only at
    # absolute end-of-text (probed on DuckDB 1.0:
    # regexp_matches('abc'||chr(10),'abc$') is false): a silent value
    # divergence for data with trailing newlines (r11 ADVICE find).
    # Refuse any unescaped '$' (conservative — '$' inside a character
    # class is literal in both engines, but this gate does not parse
    # classes) and the Java-only '\Z' anchor.  '\z' and '\A' mean
    # absolute end/start in BOTH engines and pass.
    j = 0
    while j < len(pat):
        if pat[j] == "\\":
            if pat[j + 1:j + 2] == "Z":
                raise DialectError(
                    f"{fn}() pattern uses the Java-only \\Z anchor — "
                    "not unparsable")
            j += 2
            continue
        if pat[j] == "$":
            raise DialectError(
                f"{fn}() pattern '$' matches before a trailing newline "
                "in Java but only at end-of-text in RE2 — not "
                "unparsable")
        j += 1
    return pat


def _h_rlike(name, inner):
    a = _split_top_args(inner)
    if len(a) != 2:
        raise DialectError(f"{len(a)}-arg {name}() — not unparsable")
    _require_safe_regex(a[1], name)
    return f"regexp_matches({a[0]}, {a[1]})"


def _h_case_fold(name, inner):
    """upper()/lower() pass through — with one gate.  Java (Spark) uses
    FULL Unicode case mapping where DuckDB uses simple mapping, so the
    engines diverge on exactly the code points functions_edge.py:13
    documents as differing by design between runtimes: upper('ß') =
    'SS' vs 'ẞ', lower('İ') keeps the combining dot vs plain 'i',
    ligature expansion upper('ﬁ') = 'FI' vs 'ﬁ' (probed; pinned in
    fuzz axis 27).  Any non-ASCII character in the rendered argument
    (literal or identifier) refuses; ASCII-only arguments over ASCII
    data agree exactly, and the testdata corpus is ASCII — a
    non-ASCII-bearing COLUMN would still silently diverge, which is
    why the tolerance is documented here rather than assumed."""
    if any(ord(c) > 127 for c in inner):
        why = ("DuckDB counts bytes where Spark counts code points"
               if name.lower() == "levenshtein" else
               "Java full case mapping (SS/İ/ligatures) differs from "
               "DuckDB's simple mapping")
        raise DialectError(
            f"{name}() over non-ASCII text — {why} — not unparsable")
    return f"{name}({inner})"


def _h_left_right(name, inner):
    # Spark left()/right() return '' for n <= 0; DuckDB interprets a
    # NEGATIVE n as "all but n from the other end" (probe find:
    # left('abcde', -1) = 'abcd') — silent value divergence.  The
    # guard reproduces Spark; positive n is identical in both.
    a = _split_top_args(inner)
    if len(a) != 2:
        raise DialectError(f"{len(a)}-arg {name}() — not unparsable")
    return (f"(CASE WHEN ({a[1]}) <= 0 THEN '' "
            f"ELSE {name}({a[0]}, {a[1]}) END)")


def _h_substring(name, inner):
    # Two probe finds on the pass-through: Spark treats position 0 as
    # position 1 (substring('abcde', 0, 2) = 'ab') where DuckDB's
    # window covers the empty pre-string slot ('a'); and Spark returns
    # '' for a NEGATIVE length where DuckDB reads it end-relative
    # (substr('abcde', 2, -1) = 'a').  Negative positions and zero
    # length agree exactly (probed) — map pos 0 → 1 and clamp the
    # length at 0.
    a = _split_top_args(inner)
    if len(a) == 2:
        a.append("2147483647")  # Catalyst's own to-end sentinel
    if len(a) != 3:
        raise DialectError(f"{len(a)}-arg {name}() — not unparsable")
    s_, pos, ln = a
    return (f"{name}({s_}, (CASE WHEN ({pos}) = 0 THEN 1 "
            f"ELSE ({pos}) END), greatest(({ln}), 0))")


def _h_pad(name, inner):
    # Spark lpad/rpad with an EMPTY pad string return the (length-
    # clamped) input; DuckDB raises "Insufficient padding" (probe
    # find — loud, but a runtime failure on rows Spark handles).
    # Both engines agree on truncation and on negative lengths with a
    # non-empty pad (probed), so only the empty-pad arm needs the
    # left() spelling.
    a = _split_top_args(inner)
    if len(a) != 3:
        raise DialectError(f"{len(a)}-arg {name}() — not unparsable")
    s_, n, pad = a
    if _re_mod.fullmatch(r"'(?:[^']|'')+'", pad):
        return f"{name}({inner})"          # provably non-empty literal
    if pad == "''":
        return f"left({s_}, greatest(({n}), 0))"
    return (f"(CASE WHEN ({pad}) = '' THEN "
            f"left({s_}, greatest(({n}), 0)) "
            f"ELSE {name}({s_}, {n}, {pad}) END)")


def _h_get_json_object(name, inner):
    """json_extract_string with two r12 guards (probe finds on the bare
    rename): (1) DuckDB ERRORS on malformed JSON where Spark returns
    NULL — data-dependent runtime failure in the emitted text; the
    json_valid() CASE restores Spark's NULL (probed).  (2) a WILDCARD
    or recursive path ('[*]', '..') returns the matched JSON TEXT in
    Spark ('[1,2]') but a LIST in DuckDB (['1','2']) — a silent
    type+value divergence; literal paths carrying either construct
    refuse, as do non-literal paths (uncheckable, and Spark maps an
    invalid path to NULL where DuckDB raises)."""
    a = _split_top_args(inner)
    if len(a) != 2:
        raise DialectError(
            f"{len(a)}-arg get_json_object() — not unparsable")
    doc, path = a
    m = _re_mod.fullmatch(r"'((?:[^']|'')*)'", path)
    if not m:
        raise DialectError(
            "get_json_object() path is not a string literal — Spark "
            "maps invalid paths to NULL where DuckDB raises — not "
            "unparsable")
    if "*" in m.group(1) or ".." in m.group(1):
        raise DialectError(
            "get_json_object() wildcard/recursive path returns JSON "
            "text in Spark but a LIST in DuckDB — not unparsable")
    return (f"(CASE WHEN json_valid({doc}) THEN "
            f"json_extract_string({doc}, {path}) ELSE NULL END)")


def _h_regexp_substr(name, inner):
    # Spark regexp_substr is NULL on no-match where DuckDB
    # regexp_extract returns '' (probed) — the regexp_matches guard
    # restores the NULL exactly; same safe-regex gate as the rest
    a = _split_top_args(inner)
    if len(a) != 2:
        raise DialectError(f"{len(a)}-arg {name}() — not unparsable")
    _require_safe_regex(a[1], name)
    return (f"(CASE WHEN regexp_matches({a[0]}, {a[1]}) THEN "
            f"regexp_extract({a[0]}, {a[1]}) ELSE NULL END)")


def _h_regexp_extract(name, inner):
    # DuckDB spells both the same way with the same group-index and
    # empty-on-no-match semantics (probed: no-match returns '' / [])
    a = _split_top_args(inner)
    if len(a) != 3:
        raise DialectError(f"{len(a)}-arg {name}() — not unparsable")
    _require_safe_regex(a[1], name)
    if not _re_mod.match(r"^\d+$", a[2]):
        raise DialectError(
            f"{name}() group index is not a literal — not unparsable")
    return f"{name}({a[0]}, {a[1]}, {a[2]})"


_SPLIT_META = set(".^$*+?()[]{}|\\")


def _h_split(name, inner):
    a = _split_top_args(inner)
    if len(a) != 3 or a[2] != "-1":
        raise DialectError(
            "split() with an explicit LIMIT has no DuckDB spelling — "
            "not unparsable")
    pat = _require_safe_regex(a[1], name)
    if pat == "":
        raise DialectError(
            "split() on an empty pattern — not unparsable")
    if not (_SPLIT_META & set(pat)):
        return f"string_split({a[0]}, {a[1]})"
    # Zero-width-capable patterns diverge (r11 ADVICE find): Java split
    # SKIPS zero-width matches adjacent to a real match ('a1b' split on
    # '1*' → ['a','b']) while DuckDB string_split_regex emits empty
    # fields (probed: ['a','','b']).  Refuse any pattern that can match
    # the empty string; Python re's nullability matches Java's on the
    # safe-regex subset this gate already enforces.
    try:
        can_empty = _re_mod.fullmatch(pat, "") is not None
    except _re_mod.error:
        can_empty = True  # pattern this probe can't parse: refuse
    if can_empty:
        raise DialectError(
            "split() pattern can match the empty string — Java skips "
            "zero-width matches where DuckDB emits empty fields, "
            "not unparsable")
    return f"string_split_regex({a[0]}, {a[1]})"


# Java SimpleDateFormat (letter, run-length) pairs with exact strptime
# PARSING equivalents; any other letter-run (yy, SSS, a, EEE, z, ...)
# refuses — close-but-different is exactly what this table must never
# emit.  Run-based for the same reason as _DATE_FMT_RUNS (r12: a
# longest-first list silently split 'MMMM' into '%m%m').
_JAVA_PARSE_RUNS = {("y", 4): "%Y", ("M", 2): "%m", ("d", 2): "%d",
                    ("H", 2): "%H", ("m", 2): "%M", ("s", 2): "%S"}


def _java_fmt_to_strptime(fmt: str, fn: str) -> str:
    return _java_fmt_runs(fmt, fn, _JAVA_PARSE_RUNS, punct=" -/:.T_,")


def _h_unix_timestamp(name, inner):
    """Spark unix_timestamp(x, 'javafmt') -> whole epoch seconds
    (BIGINT, session-tz interpreted — this repo pins UTC sessions).
    DuckDB: strptime parses VARCHAR with the mapped format; epoch
    yields seconds.  The operand is cast to VARCHAR so string columns
    pass through unchanged and second-precision timestamps round-trip
    via their canonical rendering (a fractional-second timestamp fails
    strptime LOUDLY, never silently)."""
    a = _split_top_args(inner)
    if len(a) == 1:
        return f"CAST(floor(epoch({a[0]})) AS BIGINT)"
    if len(a) != 2:
        raise DialectError(
            f"{len(a)}-arg unix_timestamp() — not unparsable")
    m = _re_mod.match(r"^'([^'\\]*)'$", a[1])
    if m is None:
        raise DialectError(
            "unix_timestamp() format is not a plain literal — "
            "not unparsable")
    fmt = _java_fmt_to_strptime(m.group(1), name)
    return (f"CAST(floor(epoch(strptime(CAST({a[0]} AS VARCHAR), "
            f"'{fmt}'))) AS BIGINT)")


def _lambda_parts(txt: str):
    """Parse a rendered arrow lambda ``(a, b) -> body`` / ``a -> body``
    into (params, body); None when the text is not a lambda."""
    m = re.match(r"^\((\w+), (\w+)\)\s*->\s*(.*)$", txt, re.S)
    if m:
        return [m.group(1), m.group(2)], m.group(3)
    m = re.match(r"^(\w+)\s*->\s*(.*)$", txt, re.S)
    if m:
        return [m.group(1)], m.group(2)
    return None


def _subst_word(body: str, old: str, new: str) -> str:
    """Replace identifier ``old`` with ``new`` in the outside-literal
    segments of ``body`` (lambda variables are generator-fresh names, but
    a same-spelled substring inside a string literal must survive)."""
    return "".join(
        s if is_lit else re.sub(rf"\b{re.escape(old)}\b", new, s)
        for is_lit, s in _Unparser._literal_segments(body))


def _is_identity_lambda(txt: str) -> bool:
    lp = _lambda_parts(txt)
    return bool(lp) and len(lp[0]) == 1 and lp[1].strip() == lp[0][0]


# Catalyst renders array_sort's DEFAULT comparator as an explicit
# IF-chain lambda (asc, NULLs last).  Recognizing that exact shape lets
# the default sort translate to list_sort; any other comparator refuses.
_CANON_CMP = ("(IF(((A IS NULL) AND (B IS NULL)), 0, (IF((A IS NULL), 1, "
              "(IF((B IS NULL), -1, (IF((A < B), -1, (IF((A > B), 1, 0))))"
              "))))))")


def _h_array_sort(name, inner):
    args = _split_top_args(inner)
    if len(args) == 1:
        return f"list_sort({args[0]}, 'ASC', 'NULLS LAST')"
    if len(args) == 2:
        lp = _lambda_parts(args[1])
        if lp and len(lp[0]) == 2:
            body = _subst_word(_subst_word(lp[1], lp[0][0], "A"),
                               lp[0][1], "B")
            if body.strip() == _CANON_CMP:
                return f"list_sort({args[0]}, 'ASC', 'NULLS LAST')"
    raise DialectError(
        "array_sort with a custom comparator has no faithful spelling in "
        "this dialect — not unparsable")


def _h_sort_array(name, inner):
    args = _split_top_args(inner)
    if len(args) == 1 or (len(args) == 2 and args[1] == "true"):
        return f"list_sort({args[0]}, 'ASC', 'NULLS FIRST')"
    if len(args) == 2 and args[1] == "false":
        return f"list_sort({args[0]}, 'DESC', 'NULLS LAST')"
    raise DialectError(
        "sort_array with a non-literal order flag — not unparsable")


def _h_aggregate(name, inner):
    """Spark aggregate/reduce (left fold with an init value) →
    list_reduce over list_prepend(init, arr).  The fold order and the
    empty-array result (init) match; a NULL array needs an explicit
    guard (list_prepend(init, NULL) is [init] in DuckDB, Spark yields
    NULL).  Only the identity finish lambda (Catalyst always renders
    one) is accepted."""
    args = _split_top_args(inner)
    if len(args) == 4 and not _is_identity_lambda(args[3]):
        raise DialectError(
            f"{name}() with a non-identity finish lambda has no faithful "
            "spelling in this dialect — not unparsable")
    if len(args) not in (3, 4):
        raise DialectError(f"{len(args)}-arg {name}() — not unparsable")
    arr, init, merge = args[0], args[1], args[2]
    lp = _lambda_parts(merge)
    if not lp or len(lp[0]) != 2:
        raise DialectError(f"{name}() merge lambda did not parse")
    if re.search(rf"CAST\(\s*\(*\s*{re.escape(lp[0][1])}\b", lp[1]):
        # list_prepend(init, arr) unifies the ELEMENT type with the
        # accumulator's — a merge body that casts the element (type
        # mixing) would see pre-rounded values (exec-pass find: a
        # float→DECIMAL fold drifted ~1 ulp/element)
        raise DialectError(
            f"{name}() merge casts the element — the init/element type "
            "unification would pre-round it, not unparsable")
    return (f"CASE WHEN ({arr}) IS NULL THEN NULL ELSE "
            f"list_reduce(list_prepend({init}, {arr}), "
            f"({lp[0][0]}, {lp[0][1]}) -> {lp[1]}) END")


def _h_zip_with(name, inner):
    """zip_with(a, b, (x, y) -> e) → list_transform over list_zip (both
    engines pad the shorter list with NULLs); the lambda variables are
    rewritten to the zipped struct's positional fields."""
    args = _split_top_args(inner)
    if len(args) != 3:
        raise DialectError(f"{len(args)}-arg zip_with() — not unparsable")
    lp = _lambda_parts(args[2])
    if not lp or len(lp[0]) != 2:
        raise DialectError("zip_with() lambda did not parse")
    body = lp[1]
    if re.search(r"\b__zw\b", body):
        raise DialectError("zip_with body captures the fresh variable")
    body = _subst_word(body, lp[0][0], "(__zw[1])")
    body = _subst_word(body, lp[0][1], "(__zw[2])")
    # DuckDB list_zip treats a NULL side as empty; Spark zip_with is
    # NULL when either input is NULL — guard explicitly
    return (f"CASE WHEN ({args[0]}) IS NULL OR ({args[1]}) IS NULL "
            f"THEN NULL ELSE list_transform(list_zip({args[0]}, "
            f"{args[1]}), __zw -> {body}) END")


# Heads that syntactically PROVE a list argument.  list_value( is the
# unparser's own translation of Spark array() — inner args are rewritten
# before the handler runs, so that is the spelling _h_reverse sees.
_REVERSE_LIST_HEADS = ("list_sort(", "list(", "list_value(",
                       "list_transform(", "list_zip(", "list_reverse(",
                       "list_concat(", "list_distinct(", "list_slice(",
                       "list_filter(", "flatten(", "string_split(",
                       "range(", "generate_series(", "[")


def _h_reverse(name, inner):
    """Spark reverse() is string- AND array-polymorphic; DuckDB's
    reverse() is VARCHAR-only (lists spell list_reverse).  The argument
    type is invisible in rendered text, so translate to list_reverse
    only when the argument's head syntactically PROVES a list (an
    already-translated list-producing call or a bracket literal); keep
    strings and unknowable column refs on reverse() — a list-typed
    column there fails LOUDLY at the DuckDB binder, never silently."""
    if len(_split_top_args(inner)) != 1:
        raise DialectError("multi-arg reverse() — not unparsable")
    if inner.lstrip().lower().startswith(_REVERSE_LIST_HEADS):
        return f"list_reverse({inner})"
    if any(ord(c) > 127 for c in inner):
        # axis-27 find: Spark reverses CODE POINTS (a combining mark or
        # skin-tone modifier detaches and travels), DuckDB reverses
        # GRAPHEME CLUSTERS (the cluster stays intact) — silent value
        # divergence on any multi-code-point grapheme.  Same gate
        # posture as upper()/lower(): non-ASCII rendered arguments
        # refuse, ASCII text agrees exactly.
        raise DialectError(
            "reverse() over non-ASCII text — Spark reverses code "
            "points, DuckDB grapheme clusters — not unparsable")
    return f"reverse({inner})"


def _h_slice(name, inner):
    # Spark slice(arr, start, LENGTH) vs DuckDB list_slice(arr, begin,
    # END-INCLUSIVE) — same 1-based/negative-from-end indexing otherwise
    a = _split_top_args(inner)
    if len(a) != 3:
        raise DialectError(f"{len(a)}-arg slice() — not unparsable")
    return f"list_slice({a[0]}, {a[1]}, ({a[1]}) + ({a[2]}) - 1)"


def _h_element_at(name, inner):
    """Map access by string-literal key → subscript + [1] (DuckDB map
    subscripts yield a 0/1-element LIST); array access by non-zero
    integer literal → plain subscript (both 1-based, both
    negative-from-end, both NULL out of range).  Anything else is
    type-ambiguous in text form and refuses."""
    a = _split_top_args(inner)
    if len(a) != 2:
        raise DialectError(f"{len(a)}-arg element_at() — not unparsable")
    if re.match(r"^'(?:[^'\\]|\\.)*'$", a[1]):
        return f"(({a[0]})[{a[1]}])[1]"
    if re.match(r"^-?\d+$", a[1]):
        if a[1] == "0":
            raise DialectError(
                "element_at index 0 errors in Spark, NULLs in DuckDB — "
                "not unparsable")
        return f"({a[0]})[{a[1]}]"
    raise DialectError(
        "element_at with a computed key is map/array-ambiguous — "
        "not unparsable")


_IDENT_RE = re.compile(r"^[A-Za-z_]\w*(\.[A-Za-z_]\w*)*$")


def _h_struct(name, inner):
    """struct(...) → struct_pack with Spark's field naming: a simple
    (possibly qualified) column keeps its bare name, any other
    expression gets the positional colN name."""
    args = _split_top_args(inner)
    parts = []
    for i, a in enumerate(args):
        if _IDENT_RE.match(a):
            nm = a.rsplit(".", 1)[-1]
        elif re.match(r'^"[^"]+"$', a):
            nm = a[1:-1]
        else:
            nm = f"col{i + 1}"
        parts.append(f'"{nm}" := {a}')
    return f"struct_pack({', '.join(parts)})"


def _h_named_struct(name, inner):
    args = _split_top_args(inner)
    if len(args) % 2 != 0 or not args:
        raise DialectError("odd-arg named_struct() — not unparsable")
    parts = []
    for i in range(0, len(args), 2):
        m = re.match(r"^'([^'\\\"]*)'$", args[i])
        if not m:
            raise DialectError(
                "named_struct with a computed field name — not unparsable")
        parts.append(f'"{m.group(1)}" := {args[i + 1]}')
    return f"struct_pack({', '.join(parts)})"


def _h_map(name, inner):
    args = _split_top_args(inner)
    if not args or len(args) % 2 != 0:
        raise DialectError(f"{len(args)}-arg map() — not unparsable")
    ks = ", ".join(args[0::2])
    vs = ", ".join(args[1::2])
    return f"map(list_value({ks}), list_value({vs}))"


def _h_str_to_map(name, inner):
    a = _split_top_args(inner)
    if len(a) != 3:
        raise DialectError(f"{len(a)}-arg str_to_map() — not unparsable")
    if any(re.search(r"\b__stm\b", x) for x in a):
        raise DialectError("str_to_map arg captures the fresh variable")
    kv = f"string_split(__stm, {a[2]})"
    return (f"map_from_entries(list_transform(string_split({a[0]}, {a[1]}),"
            f" __stm -> struct_pack(\"k\" := {kv}[1], \"v\" := {kv}[2])))")


def _h_locate(name, inner):
    a = _split_top_args(inner)
    if len(a) == 2:
        return f"instr({a[1]}, {a[0]})"
    if len(a) == 3:
        found = f"instr(substring({a[1]}, {a[2]}), {a[0]})"
        return (f"CASE WHEN {found} = 0 THEN 0 "
                f"ELSE {found} + ({a[2]}) - 1 END")
    raise DialectError(f"{len(a)}-arg locate() — not unparsable")


def _h_conv(name, inner):
    a = _split_top_args(inner)
    if len(a) == 3 and a[1] == "10" and a[2] == "16":
        return f"upper(to_base(CAST({a[0]} AS BIGINT), 16))"
    raise DialectError(
        "conv() only translates base 10 → 16 — not unparsable")


def _h_elt(name, inner):
    a = _split_top_args(inner)
    if len(a) < 2:
        raise DialectError(f"{len(a)}-arg elt() — not unparsable")
    return f"(list_value({', '.join(a[1:])}))[{a[0]}]"


def _h_bround(name, inner):
    a = _split_top_args(inner)
    if len(a) == 1:
        return f"round_even({a[0]}, 0)"
    if len(a) == 2:
        return f"round_even({a[0]}, {a[1]})"
    raise DialectError(f"{len(a)}-arg bround() — not unparsable")


def _h_shift(name, inner):
    """Java shift semantics mask the count by the operand's bit width,
    which text-form translation cannot know — only literal counts that
    behave identically for both widths (0..31) translate.  In-range
    value overflow differs loudly (Java wraps, DuckDB errors)."""
    a = _split_top_args(inner)
    op = "<<" if name.lower() == "shiftleft" else ">>"
    if len(a) == 2 and re.match(r"^\d+$", a[1]) and int(a[1]) <= 31:
        return f"({a[0]} {op} {a[1]})"
    raise DialectError(
        f"{name}() count is masked by operand bit width in Spark — "
        "only literal 0..31 translates, not unparsable")


def _h_percentile(name, inner):
    a = _split_top_args(inner)
    unit_freq = len(a) == 3 and re.fullmatch(
        r"(?:CAST\()*1(?: AS \w+\))*", a[2])
    if len(a) == 2 or unit_freq:
        return f"quantile_cont({a[0]}, {a[1]})"
    raise DialectError(
        "percentile() with a non-unit frequency — not unparsable")


_TSADD_UNITS = {"year": "YEAR", "month": "MONTH", "week": "WEEK",
                "day": "DAY", "hour": "HOUR", "minute": "MINUTE",
                "second": "SECOND", "millisecond": "MILLISECOND",
                "microsecond": "MICROSECOND"}


def _h_timestampadd(name, inner):
    a = _split_top_args(inner)
    if len(a) != 3:
        raise DialectError(f"{len(a)}-arg {name}() — not unparsable")
    u = a[0].lower()
    if u == "quarter":
        return f"(({a[2]}) + ({a[1]}) * 3 * INTERVAL 1 MONTH)"
    if u not in _TSADD_UNITS:
        raise DialectError(f"{name}() unit {a[0]} — not unparsable")
    return f"(({a[2]}) + ({a[1]}) * INTERVAL 1 {_TSADD_UNITS[u]})"


def _h_datediff(name, inner):
    a = _split_top_args(inner)
    if len(a) != 2:
        raise DialectError(
            f"{len(a)}-arg {name}() counts boundary crossings differently "
            "per engine — not unparsable")
    return f"date_diff('day', {a[1]}, {a[0]})"


def _strip_binary_cast(arg: str) -> str:
    m = re.match(r"^CAST\((.*) AS BINARY\)$", arg, re.S)
    if m and _balanced_ok(m.group(1)):
        return m.group(1)
    return arg


def _balanced_ok(txt: str) -> bool:
    depth = 0
    i, n = 0, len(txt)
    while i < n:
        ch = txt[i]
        if ch in ("'", '"'):
            i = _skip_quoted(txt, i)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
        i += 1
    return depth == 0


def _h_md5(name, inner):
    # Spark md5 takes BINARY (strings render through CAST AS BINARY);
    # DuckDB md5 hashes the VARCHAR's UTF-8 bytes directly — same bytes
    a = _split_top_args(inner)
    if len(a) != 1:
        raise DialectError(f"{len(a)}-arg md5() — not unparsable")
    return f"md5({_strip_binary_cast(a[0])})"


def _h_sha2(name, inner):
    a = _split_top_args(inner)
    if len(a) == 2 and a[1] in ("0", "256"):
        return f"sha256({_strip_binary_cast(a[0])})"
    raise DialectError(
        "sha2() only translates the 256-bit form — not unparsable")


def _h_collect(name, inner, tail):
    """Spark's collect_set/collect_list SKIP NULL inputs and return []
    for a fully-filtered group; DuckDB's list() keeps NULLs (sweep
    divergence on dedup_incremental_lsh: banded CASE-projected ids
    collapsed to [NULL] lists that passed a len(..) > 0 gate) and
    returns NULL for an empty aggregate.  FILTER + COALESCE reproduce
    both semantics exactly (probed).  WINDOW position ABSORBS the OVER
    clause and duplicates it into an emptiness guard — a bare
    list(..) FILTER OVER would leave DuckDB's NULL for a frame whose
    every element is NULL where Spark emits [] (probed both engines on
    all-NULL, empty and FOLLOWING-only frames; count(x) already skips
    NULLs so it is exactly the emptiness test).  A named-window
    OVER w reference (never Catalyst-rendered) refuses."""
    distinct = "DISTINCT " if name.lower() == "collect_set" else ""
    stripped = tail.lstrip()
    if stripped.upper().startswith("OVER"):
        pad = len(tail) - len(stripped)
        j = pad + 4
        while j < len(tail) and tail[j] == " ":
            j += 1
        if j >= len(tail) or tail[j] != "(":
            raise DialectError(
                f"{name}() OVER a named window reference — not "
                "unparsable")
        close = _balanced_close(tail, j)
        # the absorbed window spec skips the call site's arg rewriting —
        # run it through the same rule table (ORDER BY keys may contain
        # translated functions)
        over = _rewrite_functions(tail[j:close + 1], _DUCKDB_FN_RULES)
        return (f"(CASE WHEN count({inner}) OVER {over} = 0 THEN [] "
                f"ELSE list({distinct}{inner}) "
                f"FILTER (WHERE ({inner}) IS NOT NULL) OVER {over} END)",
                close + 1)
    return (f"COALESCE(list({distinct}{inner}) "
            f"FILTER (WHERE ({inner}) IS NOT NULL), [])")


# Spark next_day() day-of-week names (DateTimeUtils.getDayOfWeekFromString,
# case-insensitive 2-letter / 3-letter / full forms) → DuckDB
# date_part('dow') numbers (Sunday=0 … Saturday=6).
_NEXT_DAY_DOW = {}
for _dow_n, _dow_names in enumerate(
        (("su", "sun", "sunday"), ("mo", "mon", "monday"),
         ("tu", "tue", "tuesday"), ("we", "wed", "wednesday"),
         ("th", "thu", "thursday"), ("fr", "fri", "friday"),
         ("sa", "sat", "saturday"))):
    for _dow_name in _dow_names:
        _NEXT_DAY_DOW[_dow_name] = _dow_n


def _h_next_day(name, inner):
    """DuckDB has no next_day(); spell the strictly-later next weekday
    with dow arithmetic.  ((target - dow(d) - 1) mod 7) + 1 is the day
    delta in 1..7 (7 when d already IS the target weekday — Spark
    returns the NEXT occurrence, never d itself; probed both engines).
    Only a recognized literal day name translates: Spark maps an
    unknown name to NULL (non-ANSI), which has no faithful spelling."""
    a = _split_top_args(inner)
    if len(a) != 2:
        raise DialectError(f"{len(a)}-arg next_day() — not unparsable")
    m = _re_mod.fullmatch(r"'([A-Za-z]+)'", a[1])
    dow = _NEXT_DAY_DOW.get(m.group(1).lower()) if m else None
    if dow is None:
        raise DialectError(
            "next_day() day-of-week argument is not a recognized "
            "literal day name — not unparsable")
    d = f"CAST({a[0]} AS DATE)"
    return (f"({d} + CAST((({dow} - date_part('dow', {d}) - 1) % 7 + 7) "
            f"% 7 + 1 AS INT))")


def _h_months_between(name, inner):
    """Spark months_between() (DateTimeUtils.monthsBetween): calendar
    month delta, plus — unless both operands share a day-of-month or are
    both month-ends — (dayDiff * 86400 + secondOfDay1 - secondOfDay2) /
    (31 * 86400), rounded HALF_UP to 8 places when roundOff.  Every
    component has an exact DuckDB spelling (date_part/last_day/epoch;
    floor() reproduces Spark's whole-second truncation of the
    time-of-day terms); probed value-equal on month-end, same-day and
    fractional cases.  DuckDB has no months_between at all, so the
    expansion is the only faithful rendering."""
    a = _split_top_args(inner)
    if len(a) == 2:
        a.append("true")
    if len(a) != 3 or a[2] not in ("true", "false"):
        raise DialectError(
            "months_between() roundOff argument is not a boolean "
            "literal — not unparsable")
    t1, t2 = a[0], a[1]
    months = (f"((date_part('year', {t1}) - date_part('year', {t2})) * 12 "
              f"+ (date_part('month', {t1}) - date_part('month', {t2})))")
    same = (f"((date_part('day', {t1}) = date_part('day', {t2})) OR "
            f"(CAST({t1} AS DATE) = last_day(CAST({t1} AS DATE)) AND "
            f"CAST({t2} AS DATE) = last_day(CAST({t2} AS DATE))))")
    sec1 = f"floor(epoch({t1}) - epoch(date_trunc('day', {t1})))"
    sec2 = f"floor(epoch({t2}) - epoch(date_trunc('day', {t2})))"
    frac = (f"(((date_part('day', {t1}) - date_part('day', {t2})) * 86400 "
            f"+ ({sec1} - {sec2})) / 2678400.0)")
    total = (f"(CAST({months} AS DOUBLE) + CASE WHEN {same} THEN 0.0 "
             f"ELSE {frac} END)")
    return f"round({total}, 8)" if a[2] == "true" else total


def _h_make_ym_interval(name, inner):
    a = _split_top_args(inner)
    if len(a) != 2:
        raise DialectError(
            f"{len(a)}-arg make_ym_interval() — not unparsable")
    return (f"(to_years(CAST({a[0]} AS INTEGER)) + "
            f"to_months(CAST({a[1]} AS INTEGER)))")


def _h_concat(name, inner):
    # DuckDB's concat() SKIPS NULL arguments (Postgres semantics); Spark
    # concat is NULL if ANY argument is NULL (exec-pass divergence find).
    # The || operator propagates NULL in both engines, for strings and
    # lists alike.
    args = _split_top_args(inner)
    if len(args) < 2:
        return f"({inner})"
    return "(" + " || ".join(args) + ")"


def _h_regexp_replace(name, inner):
    a = _split_top_args(inner)
    if not (len(a) == 3 or (len(a) == 4 and a[3] == "1")):
        raise DialectError(
            "regexp_replace from a non-initial position — not unparsable")
    # REPLACEMENT backreference syntax differs: Spark (Java) uses $1,
    # DuckDB (RE2 rewrite) uses \1 and treats $1 as LITERAL text —
    # cb_q28 exec-pass find: the '$1' group key collapsed every URL
    # into one literal-'$1' group.  Transform inside the literal:
    # $N -> \N, Java's escaped \$ -> literal $.  Non-literal
    # replacements (column refs) can carry $-refs invisibly — refuse.
    m = _re_mod.match(r"^'((?:[^'\\]|\\.)*)'$", a[2])
    if m is None:
        raise DialectError(
            "regexp_replace replacement is not a plain literal — "
            "$-backreference semantics untranslatable")
    raw, out, i = m.group(1), [], 0
    while i < len(raw):
        ch = raw[i]
        if ch == "$" and i + 1 < len(raw) and raw[i + 1].isdigit():
            out.append("\\\\" + raw[i + 1])  # Spark-escaped backslash
            i += 2
        elif ch == "$":
            raise DialectError(
                "regexp_replace replacement contains a bare '$' — "
                "not unparsable")
        elif ch == "\\" and raw[i:i + 2] == "\\$":
            out.append("$")
            i += 2
        elif ch == "\\":
            raise DialectError(
                "regexp_replace replacement escape not translatable: "
                f"{raw[i:i + 2]}")
        else:
            out.append(ch)
            i += 1
    repl = "'" + "".join(out) + "'"
    return f"regexp_replace({a[0]}, {a[1]}, {repl}, 'g')"


def _h_encode(name, inner):
    a = _split_top_args(inner)
    charset = a[1].strip("'").lower().replace("-", "") if len(a) == 2 else ""
    if charset == "utf8":
        return f"{name.lower()}({a[0]})"
    raise DialectError(
        f"{name}() only translates the UTF-8 charset — not unparsable")


def _h_minmax_by(name, inner, tail):
    """Scalar rankings map 1:1 onto DuckDB's min_by/max_by.  A STRUCT
    ranking (Spark's idiomatic multi-key form) has no arg_min/arg_max
    overload in DuckDB 1.0 (probed: binder error), but DuckDB's
    first(x ORDER BY ...) aggregate modifier spells the identical
    semantics: Spark compares struct fields left-to-right with NULL
    smallest, so max_by → DESC NULLS LAST per field and min_by → ASC
    NULLS FIRST (probed on NULL-field, NULL-value and multi-key
    cases — including that neither engine skips a NULL value at the
    winning rank).  WINDOW position refuses: DuckDB has no ORDER BY
    inside window aggregates (loud parser error)."""
    a = _split_top_args(inner)
    if len(a) == 2 and a[1].startswith("struct_pack("):
        if tail.lstrip().upper().startswith("OVER"):
            raise DialectError(
                f"{name}() struct ranking in window position — DuckDB "
                "window aggregates take no ORDER BY — not unparsable")
        fields = _split_top_args(a[1][len("struct_pack("):-1])
        keys = []
        for f in fields:
            m = _re_mod.match(r'^"(?:[^"]|"")*" := (.*)$', f, _re_mod.S)
            if not m:
                raise DialectError(
                    f"{name}() struct ranking field does not match the "
                    "struct_pack render — not unparsable")
            keys.append(m.group(1))
        direction = ("DESC NULLS LAST" if name.lower() == "max_by"
                     else "ASC NULLS FIRST")
        order = ", ".join(f"{k} {direction}" for k in keys)
        return f"first({a[0]} ORDER BY {order})"
    return f"{name}({inner})"


def _h_substring_index(name, inner):
    """DuckDB has no substring_index(); a literal non-empty delimiter
    translates via string_split + list_slice + array_to_string (probed
    against Spark on positive/negative/overflowing/zero counts, absent
    delimiters and the empty string).  array_to_string requires a
    CONSTANT separator in DuckDB (binder error otherwise), so a
    non-literal delimiter refuses; the empty-delimiter literal refuses
    too (Spark returns '' unconditionally, DuckDB string_split would
    split per character)."""
    a = _split_top_args(inner)
    if len(a) != 3:
        raise DialectError(
            f"{len(a)}-arg substring_index() — not unparsable")
    s_, d, n = a
    if not _re_mod.fullmatch(r"'(?:[^']|'')+'", d):
        raise DialectError(
            "substring_index() delimiter is not a non-empty string "
            "literal — DuckDB array_to_string takes only constant "
            "separators — not unparsable")
    parts = f"string_split({s_}, {d})"
    # the explicit NULL arm is load-bearing twice: the n = 0 arm would
    # return '' for a NULL input, and DuckDB's greatest() IGNORES NULL
    # operands (probed: a NULL count otherwise returns the whole string)
    return (f"(CASE WHEN ({s_}) IS NULL OR ({n}) IS NULL THEN NULL "
            f"WHEN ({n}) = 0 THEN '' WHEN ({n}) > 0 THEN "
            f"array_to_string(list_slice({parts}, 1, {n}), {d}) "
            f"ELSE array_to_string(list_slice({parts}, "
            f"greatest(len({parts}) + ({n}) + 1, 1), len({parts})), "
            f"{d}) END)")


def _h_regexp_count(name, inner):
    """len(regexp_extract_all(...)) — gated by the same Java-vs-RE2
    safety check every other regex translation passes through."""
    a = _split_top_args(inner)
    if len(a) != 2:
        raise DialectError(f"{len(a)}-arg regexp_count() — not unparsable")
    _require_safe_regex(a[1], name)
    return f"len(regexp_extract_all({a[0]}, {a[1]}))"


def _h_factorial(name, inner):
    # Spark factorial is NULL outside 0..20; DuckDB's INT128 result keeps
    # going — the guard restores the NULL range exactly
    return (f"(CASE WHEN ({inner}) BETWEEN 0 AND 20 THEN "
            f"factorial(CAST({inner} AS INTEGER)) ELSE NULL END)")


def _h_array_repeat(name, inner):
    a = _split_top_args(inner)
    if len(a) != 2:
        raise DialectError(f"{len(a)}-arg array_repeat() — not unparsable")
    if any(re.search(r"\b__ar\b", x) for x in a):
        raise DialectError("array_repeat arg captures the fresh variable")
    return f"list_transform(range({a[1]}), __ar -> ({a[0]}))"


def _h_to_binary(name, inner):
    a = _split_top_args(inner)
    fmt = (a[1].strip("'").lower().replace("-", "")
           if len(a) == 2 else "hex")
    if len(a) in (1, 2) and fmt == "utf8":
        return f"encode({a[0]})"
    if len(a) in (1, 2) and fmt == "hex":
        return f"unhex({a[0]})"
    if len(a) == 2 and fmt == "base64":
        return f"from_base64({a[0]})"
    raise DialectError(f"to_binary() format — not unparsable")


def _h_make_dt_interval(name, inner):
    a = _split_top_args(inner)
    if len(a) != 4:
        raise DialectError(
            f"{len(a)}-arg make_dt_interval() — not unparsable")
    return (f"(to_days(CAST({a[0]} AS INTEGER)) + "
            f"to_hours(CAST({a[1]} AS INTEGER)) + "
            f"to_minutes(CAST({a[2]} AS INTEGER)) + "
            f"to_seconds(CAST({a[3]} AS DOUBLE)))")


# Java SimpleDateFormat (letter, run-length) → strftime; any other
# letter-run refuses (silent-format class).  RUN-BASED on purpose (r12
# find, caught by this round's own regression test): Java semantics
# attach to the whole repeated-letter RUN — 'EEEEE' is the NARROW day
# name ('T'), 'MMMM' the full month name, 'aa' still 'PM' — while a
# longest-first token list silently splits them into valid pairs
# ('EEEE'+'E' → '%A%a').  E-family (probed): E/EE/EEE = short day name
# ('Tue') = %a, EEEE = full ('Tuesday') = %A — both engines emit
# English names under the default locale; this unlocked the tpcds
# d_day_name derivation (the largest DuckDB-exec refusal class at 102
# entries).
_DATE_FMT_RUNS = {("y", 4): "%Y", ("y", 2): "%y", ("M", 2): "%m",
                  ("d", 2): "%d", ("H", 2): "%H", ("h", 2): "%I",
                  ("m", 2): "%M", ("s", 2): "%S", ("a", 1): "%p",
                  ("E", 1): "%a", ("E", 2): "%a", ("E", 3): "%a",
                  ("E", 4): "%A"}


def _java_fmt_runs(pat: str, fn: str, table: dict,
                   punct: str | None = None) -> str:
    """Translate a Java date-format literal to strftime by LETTER RUNS:
    each maximal run of a repeated letter must map as a whole (Java
    count semantics), any unmapped run refuses.  ``punct`` restricts
    the allowed separator characters (None = any non-letter except %,
    which would inject strftime directives)."""
    out: list[str] = []
    i = 0
    while i < len(pat):
        ch = pat[i]
        if ch.isalpha():
            j = i
            while j < len(pat) and pat[j] == ch:
                j += 1
            rep = table.get((ch, j - i))
            if rep is None:
                raise DialectError(
                    f"{fn}() pattern token {ch * (j - i)!r} has no "
                    "exact strftime/strptime translation — not "
                    "unparsable")
            out.append(rep)
            i = j
            continue
        if ch == "%" or (punct is not None and ch not in punct):
            raise DialectError(
                f"{fn}() pattern separator {ch!r} is not translatable")
        out.append(ch)
        i += 1
    return "".join(out)


# Spark Catalyst scalar type SQL → DuckDB spelling (identical names
# omitted: BOOLEAN, DATE, TINYINT/SMALLINT/INT/BIGINT, FLOAT, DOUBLE,
# DECIMAL(p,s) all parse in DuckDB with the same meaning)
_DUCK_SCALAR_TYPES = {"STRING": "VARCHAR", "INT": "INTEGER",
                      "TIMESTAMP": "TIMESTAMP", "TIMESTAMP_NTZ": "TIMESTAMP",
                      "BINARY": "BLOB"}


def _duck_type_sql(dt) -> str:
    """DuckDB spelling of a Catalyst DataType (r12, for the complex-cast
    repair in the DUCKDB dialect: Spark's ARRAY<T>/MAP<K,V>/STRUCT<...>
    generics don't parse there; DuckDB spells them T[]/MAP(K,V)/
    STRUCT(name T)).  Unknown types refuse."""
    cls = dt.getClass().getSimpleName()
    if cls == "ArrayType":
        return f"{_duck_type_sql(dt.elementType())}[]"
    if cls == "MapType":
        # NOTE the space before '(': the emitted type text flows through
        # _rewrite_functions, whose tokenizer only fires on name( with
        # no gap — 'MAP (' / 'STRUCT (' keep the type spelling out of
        # the map()/struct() VALUE-expression rules (probed: DuckDB
        # parses the spaced form identically)
        return (f"MAP ({_duck_type_sql(dt.keyType())}, "
                f"{_duck_type_sql(dt.valueType())})")
    if cls == "StructType":
        flds = dt.fields()
        try:
            fields = [(flds.apply(i).name(), flds.apply(i).dataType())
                      for i in range(flds.size())]
        except Exception:  # noqa: BLE001 - py4j array conversion
            fields = [(f.name(), f.dataType()) for f in flds]
        for nm, _t in fields:
            if '"' in nm or "'" in nm:
                raise DialectError(
                    f"struct field {nm!r} not quotable in DuckDB")
        inner = ", ".join(f'"{nm}" {_duck_type_sql(t)}' for nm, t in fields)
        return f"STRUCT ({inner})"  # spaced: see the MapType note
    s = dt.sql().upper()
    if s in _DUCK_SCALAR_TYPES:
        return _DUCK_SCALAR_TYPES[s]
    if s in ("BOOLEAN", "DATE", "TINYINT", "SMALLINT", "BIGINT",
             "FLOAT", "DOUBLE") or s.startswith("DECIMAL"):
        return s
    raise DialectError(
        f"type {s[:40]} has no DuckDB spelling — not unparsable")


def _require_duck_cast_pair(src, dst) -> None:
    """Refuse nested element-cast pairs whose SCALAR semantics diverge
    between the engines (the same classes the top-level Cast check
    refuses: fractional→integral truncation-vs-rounding, fractional→
    string formatting, numeric↔timestamp epoch semantics) — a complex
    cast applies them per element, where no trunc() wrap can reach
    (r12).  Everything else either matches (probed: DuckDB complex
    casts are elementwise and NULL-preserving like Spark's) or fails
    the DuckDB binder loudly."""
    scls = src.getClass().getSimpleName()
    dcls = dst.getClass().getSimpleName()
    if scls == "ArrayType" and dcls == "ArrayType":
        _require_duck_cast_pair(src.elementType(), dst.elementType())
        return
    if scls == "MapType" and dcls == "MapType":
        _require_duck_cast_pair(src.keyType(), dst.keyType())
        _require_duck_cast_pair(src.valueType(), dst.valueType())
        return
    if scls == "StructType" and dcls == "StructType":
        sf, df = src.fields(), dst.fields()
        try:
            spairs = [(sf.apply(i).name(), sf.apply(i).dataType())
                      for i in range(sf.size())]
            dpairs = [(df.apply(i).name(), df.apply(i).dataType())
                      for i in range(df.size())]
        except Exception:  # noqa: BLE001 - py4j array conversion
            spairs = [(f.name(), f.dataType()) for f in sf]
            dpairs = [(f.name(), f.dataType()) for f in df]
        if len(spairs) != len(dpairs) or any(
                a != b for (a, _), (b, _) in zip(spairs, dpairs)):
            raise DialectError(
                "struct cast renames/re-shapes fields — Spark casts by "
                "position, DuckDB semantics unproven: refuse")
        for (_, a), (_, b) in zip(spairs, dpairs):
            _require_duck_cast_pair(a, b)
        return
    if scls != dcls and (scls in ("ArrayType", "MapType", "StructType")
                         or dcls in ("ArrayType", "MapType",
                                     "StructType")):
        raise DialectError(
            "container-class-changing cast — not unparsable")
    s, d = src.sql().upper(), dst.sql().upper()
    frac = s in ("FLOAT", "DOUBLE") or s.startswith("DECIMAL")
    if frac and d in ("TINYINT", "SMALLINT", "INT", "BIGINT", "STRING"):
        raise DialectError(
            f"element CAST({s} AS {d}) truncates in Spark but rounds/"
            "reformats in DuckDB — not repairable inside a complex cast")

    def _numt(t: str) -> bool:
        return (t in ("TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT",
                      "DOUBLE") or t.startswith("DECIMAL"))
    if ((_numt(s) and d.startswith("TIMESTAMP"))
            or (s.startswith("TIMESTAMP") and _numt(d))):
        raise DialectError(
            f"element CAST({s} AS {d}) is epoch-seconds semantics — "
            "not unparsable in this dialect")


def _h_make_interval(name, inner):
    a = _split_top_args(inner)
    if len(a) != 7:
        raise DialectError(
            f"{len(a)}-arg make_interval() — not unparsable")
    return (f"(to_years(CAST({a[0]} AS INTEGER)) + "
            f"to_months(CAST({a[1]} AS INTEGER)) + "
            f"to_days(CAST({a[2]} AS INTEGER) * 7 + "
            f"CAST({a[3]} AS INTEGER)) + "
            f"to_hours(CAST({a[4]} AS INTEGER)) + "
            f"to_minutes(CAST({a[5]} AS INTEGER)) + "
            f"to_seconds(CAST({a[6]} AS DOUBLE)))")


def _h_date_format(name, inner):
    a = _split_top_args(inner)
    if len(a) != 2 or not re.match(r"^'[^'\\]*'$", a[1]):
        raise DialectError(
            "date_format() with a computed pattern — not unparsable")
    fmt = _java_fmt_runs(a[1][1:-1], "date_format", _DATE_FMT_RUNS)
    return f"strftime({a[0]}, '{fmt}')"


def _rewrite_xor(txt: str) -> str:
    """Spark's ``^`` is bitwise XOR; DuckDB's is EXPONENTIATION — the
    nastiest kind of same-spelling divergence (exec-pass find: bxor
    returned floats).  Catalyst parenthesizes every binary op, so each
    ``a ^ b`` sits in its own paren group: rewrite to xor(a, b)."""
    while True:
        # innermost-first: take the LAST occurrence each round
        pos = -1
        opens: list[int] = []
        enclosing = None
        i, n = 0, len(txt)
        while i < n:
            ch = txt[i]
            if ch in ("'", '"'):
                i = _skip_quoted(txt, i)
                continue
            if ch == "(":
                opens.append(i)
            elif ch == ")":
                if opens:
                    opens.pop()
            elif ch == "^":
                pos = i
                enclosing = opens[-1] if opens else None
            i += 1
        if pos < 0:
            return txt
        if enclosing is None:
            raise DialectError(
                "^ (XOR in Spark, power in DuckDB) outside a paren group "
                "— not unparsable")
        close = _balanced_close(txt, enclosing)
        inner = txt[enclosing + 1:close]
        parts: list[str] = []
        depth, start, j, m = 0, 0, 0, len(inner)
        while j < m:
            ch = inner[j]
            if ch in ("'", '"'):
                j = _skip_quoted(inner, j)
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and inner.startswith(" ^ ", j):
                parts.append(inner[start:j])
                start = j + 3
            j += 1
        parts.append(inner[start:])
        if len(parts) != 2:
            raise DialectError(
                "^ expression does not match the binary paren shape — "
                "not unparsable")
        txt = (txt[:enclosing] + f"xor({parts[0]}, {parts[1]})"
               + txt[close + 1:])


_DUCKDB_FN_RULES.update({
    # ---- r10 DuckDB-execution-pass translation batch (each semantic
    # equivalence probed in DuckDB before being added; divergent classes
    # refuse instead) ----
    "startswith": ("rename", "starts_with"),
    "endswith": ("rename", "ends_with"),
    # Spark signum()/sign() always returns DOUBLE and propagates NaN;
    # DuckDB sign() returns the input's integer class and maps NaN to 0
    # (probe find) — the isnan CASE + DOUBLE cast restore both exactly
    "signum": ("template",
               "(CASE WHEN isnan(CAST(({inner}) AS DOUBLE)) THEN "
               "CAST('NaN' AS DOUBLE) ELSE "
               "CAST(sign({inner}) AS DOUBLE) END)"),
    "sign": ("template",
             "(CASE WHEN isnan(CAST(({inner}) AS DOUBLE)) THEN "
             "CAST('NaN' AS DOUBLE) ELSE "
             "CAST(sign({inner}) AS DOUBLE) END)"),
    # Spark char()/chr() is the LATIN-1 constructor: negative → '',
    # n ≥ 256 wraps mod 256 (char(321) = 'A', char(8364) = '¬'), where
    # DuckDB chr() is the full UNICODE code-point constructor
    # (chr(8364) = '€') — a silent value divergence the bare rename
    # shipped until r12 (axis-27 find).  The guard reproduces Spark
    # exactly (probed on negative/0/wrap/NULL).
    "char": ("template",
             "(CASE WHEN ({inner}) < 0 THEN '' ELSE "
             "chr(CAST(({inner}) % 256 AS INT)) END)"),
    "chr": ("template",
            "(CASE WHEN ({inner}) < 0 THEN '' ELSE "
            "chr(CAST(({inner}) % 256 AS INT)) END)"),
    "format_string": ("rename", "printf"),
    "array": ("rename", "list_value"),     # ARRAY( parses as a subquery
    "collect_list": ("custom_tail", _h_collect),
    "filter": ("rename", "list_filter"),
    "transform": ("rename", "list_transform"),
    "size": ("rename", "len"),
    "get_json_object": ("custom", lambda n, i: _h_get_json_object(n, i)),
    "char_length": ("rename", "length"),
    "character_length": ("rename", "length"),
    "map_from_arrays": ("rename", "map"),
    "unix_millis": ("rename", "epoch_ms"),
    "unix_micros": ("rename", "epoch_us"),
    "timestamp_micros": ("rename", "make_timestamp"),
    "timestamp_millis": ("template", "make_timestamp(({inner}) * 1000)"),
    "unix_seconds": ("template", "CAST(floor(epoch({inner})) AS BIGINT)"),
    "rint": ("template", "CAST(round_even({inner}, 0) AS DOUBLE)"),
    "nvl": ("template_args", ("coalesce({0}, {1})", 2)),
    "nvl2": ("template_args",
             ("CASE WHEN ({0}) IS NOT NULL THEN {1} ELSE {2} END", 3)),
    "equal_null": ("template_args",
                   ("({0} IS NOT DISTINCT FROM {1})", 2)),
    "hypot": ("template_args",
              ("sqrt(({0})*({0})+({1})*({1}))", 2)),
    "find_in_set": ("template_args",
                    ("list_position(string_split({1}, ','), {0})", 2)),
    "from_utc_timestamp": ("template_args",
                           ("(({0} AT TIME ZONE 'UTC') AT TIME ZONE {1})",
                            2)),
    "to_utc_timestamp": ("template_args",
                         ("(({0} AT TIME ZONE {1}) AT TIME ZONE 'UTC')",
                          2)),
    "array_sort": ("custom", _h_array_sort),
    "sort_array": ("custom", _h_sort_array),
    "aggregate": ("custom", _h_aggregate),
    "reduce": ("custom", _h_aggregate),
    "zip_with": ("custom", _h_zip_with),
    "reverse": ("custom", _h_reverse),
    "slice": ("custom", _h_slice),
    "element_at": ("custom", _h_element_at),
    "struct": ("custom", _h_struct),
    "named_struct": ("custom", _h_named_struct),
    "map": ("custom", _h_map),
    "str_to_map": ("custom", _h_str_to_map),
    "locate": ("custom", _h_locate),
    "conv": ("custom", _h_conv),
    "elt": ("custom", _h_elt),
    "bround": ("custom", _h_bround),
    "shiftleft": ("custom", _h_shift),
    "shiftright": ("custom", _h_shift),
    "percentile": ("custom", _h_percentile),
    "timestampadd": ("custom", _h_timestampadd),
    "datediff": ("custom", _h_datediff),
    "date_diff": ("custom", _h_datediff),
    "md5": ("custom", _h_md5),
    "sha2": ("custom", _h_sha2),
    "collect_set": ("custom_tail", _h_collect),
    "make_ym_interval": ("custom", _h_make_ym_interval),
    "concat": ("custom", _h_concat),
    "regexp_replace": ("custom", _h_regexp_replace),
    "encode": ("custom", _h_encode),
    "decode": ("custom", _h_encode),
    "min_by": ("custom_tail", _h_minmax_by),
    "max_by": ("custom_tail", _h_minmax_by),
    "factorial": ("custom", _h_factorial),
    "array_repeat": ("custom", _h_array_repeat),
    "unbase64": ("rename", "from_base64"),
    "base64": ("rename", "to_base64"),
    "btrim": ("rename", "trim"),
    "space": ("template", "repeat(' ', CAST({inner} AS INTEGER))"),
    "pmod": ("template_args",
             ("((({0}) % ({1}) + ({1})) % ({1}))", 2)),
    "cosh": ("template", "((exp({inner}) + exp(-({inner}))) / 2)"),
    # sinh/tanh emulations via exp() cancel catastrophically near 0
    # (relative error up to ~1e-6 vs Math.sinh) — refuse
    "sinh": ("refuse", None),
    "tanh": ("refuse", None),
    "array_max": ("template", "list_aggregate({inner}, 'max')"),
    "array_min": ("template", "list_aggregate({inner}, 'min')"),
    "add_months": ("template_args",
                   ("CAST(({0}) + ({1}) * INTERVAL 1 MONTH AS DATE)", 2)),
    "date_add": ("template_args", ("(({0}) + CAST({1} AS INTEGER))", 2)),
    "dateadd": ("template_args", ("(({0}) + CAST({1} AS INTEGER))", 2)),
    "date_sub": ("template_args", ("(({0}) - CAST({1} AS INTEGER))", 2)),
    "timestampdiff": ("refuse", None),    # whole-unit vs boundary count
    "to_binary": ("custom", _h_to_binary),
    "make_dt_interval": ("custom", _h_make_dt_interval),
    "make_interval": ("custom", _h_make_interval),
    "timestamp_seconds": ("template",
                          "make_timestamp(CAST(({inner}) * 1000000 "
                          "AS BIGINT))"),
    "date_format": ("custom", _h_date_format),
    # ---- r12 batch (fn_datetime_extended, reached once the E-run
    # date_format unlock stopped refusing the entry upstream): DuckDB
    # has none of these four — each expansion probed value-equal ----
    "next_day": ("custom", _h_next_day),
    "months_between": ("custom", _h_months_between),
    "unix_date": ("template",
                  "date_diff('day', DATE '1970-01-01', {inner})"),
    "date_from_unix_date": ("template",
                            "(DATE '1970-01-01' + CAST({inner} AS INT))"),
    "octet_length": ("rename", "strlen"),
    # exp(x)-1 / log(1+x) emulations cancel catastrophically near 0
    "expm1": ("refuse", None),
    "log1p": ("refuse", None),
    # ---- no faithful DuckDB spelling: clean refusals (was loud binder
    # errors on the exec pass) ----
    "initcap": ("refuse", None),          # no DuckDB counterpart
    "soundex": ("refuse", None),
    "luhn_check": ("refuse", None),
    "mask": ("refuse", None),
    "parse_url": ("refuse", None),
    "url_encode": ("refuse", None),
    "url_decode": ("refuse", None),
    "xpath": ("refuse", None),
    "xpath_string": ("refuse", None),
    "xpath_boolean": ("refuse", None),
    "xpath_double": ("refuse", None),
    "xpath_float": ("refuse", None),
    "xpath_int": ("refuse", None),
    "xpath_long": ("refuse", None),
    "xpath_number": ("refuse", None),
    "xpath_short": ("refuse", None),
    "reflect": ("refuse", None),
    "java_method": ("refuse", None),
    "format_number": ("refuse", None),    # locale grouping format
    "width_bucket": ("refuse", None),
    "overlay": ("refuse", None),          # parses PLACING, no function
    "crc32": ("refuse", None),
    "sha1": ("refuse", None),
    "sha": ("refuse", None),
    "substring_index": ("custom", _h_substring_index),
    "regexp_count": ("custom", _h_regexp_count),
    "sentences": ("refuse", None),
    "map_filter": ("refuse", None),
    "transform_values": ("refuse", None),
    "transform_keys": ("refuse", None),
    "map_zip_with": ("refuse", None),
    "exists": ("refuse", None),           # HOF form only (no paren-space)
    "forall": ("refuse", None),           # three-valued NULL semantics
    "shiftrightunsigned": ("refuse", None),
    # NULL-on-overflow/-error semantics have no DuckDB spelling (DuckDB
    # raises; translating would turn Spark's NULL into a loud error or,
    # for try_sum's HUGEINT widening, a silently different value)
    "try_add": ("refuse", None),
    "try_subtract": ("refuse", None),
    "try_multiply": ("refuse", None),
    "try_divide": ("refuse", None),
    "try_sum": ("refuse", None),
    "try_avg": ("refuse", None),
    "try_to_timestamp": ("refuse", None),
    "try_to_number": ("refuse", None),
    "try_element_at": ("refuse", None),
    "try_to_binary": ("refuse", None),
    # engine-specific sketch/bitmap state
    "approx_percentile": ("refuse", None),
    "percentile_approx": ("refuse", None),
    "hll_sketch_agg": ("refuse", None),
    "hll_sketch_estimate": ("refuse", None),
    "hll_union": ("refuse", None),
    "hll_union_agg": ("refuse", None),
    "theta_sketch_estimate": ("refuse", None),
    "theta_sketch_agg": ("refuse", None),
    "theta_union": ("refuse", None),
    "bitmap_bucket_number": ("refuse", None),
    "bitmap_bit_position": ("refuse", None),
    "bitmap_count": ("refuse", None),
    "bitmap_construct_agg": ("refuse", None),
    "bitmap_or_agg": ("refuse", None),
})


def _skip_quoted(txt: str, i: int) -> int:
    """Index just past a quoted span starting at txt[i].  Handles the
    doubled-quote escape in both quote styles and, inside SINGLE-quoted
    literals, Catalyst's C-style backslash escapes (\' and \\ — the
    rendering convention Literal.sql uses)."""
    q = txt[i]
    n = len(txt)
    i += 1
    while i < n:
        if q == "'" and txt[i] == "\\" and i + 1 < n:
            i += 2
            continue
        if txt[i] == q:
            if i + 1 < n and txt[i + 1] == q:
                i += 2
                continue
            return i + 1
        i += 1
    return n


def _balanced_close(txt: str, i: int) -> int:
    """Index of the ')' matching the '(' at txt[i], quote-aware."""
    depth = 0
    n = len(txt)
    while i < n:
        ch = txt[i]
        if ch in ("'", '"'):
            i = _skip_quoted(txt, i)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise DialectError("unbalanced parentheses in rendered text")


def _split_top_args(inner: str) -> list[str]:
    """Split a rendered argument list on top-level commas (quote/paren
    AND bracket aware — DuckDB-side rewrites produce ``[1, 2, 3]`` list
    literals whose commas are not argument separators) — for the
    multi-arg dialect templates."""
    parts: list[str] = []
    depth, start, i, n = 0, 0, 0, len(inner)
    while i < n:
        ch = inner[i]
        if ch in ("'", '"'):
            i = _skip_quoted(inner, i)
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(inner[start:i].strip())
            start = i + 1
        i += 1
    parts.append(inner[start:].strip())
    return parts


def _top_level_commas(txt: str) -> int:
    depth = 0
    count = 0
    i, n = 0, len(txt)
    while i < n:
        ch = txt[i]
        if ch in ("'", '"'):
            i = _skip_quoted(txt, i)
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            count += 1
        i += 1
    return count


def _rewrite_functions(txt: str, rules: dict) -> str:
    out: list[str] = []
    i, n = 0, len(txt)
    while i < n:
        ch = txt[i]
        if ch in ("'", '"'):
            j = _skip_quoted(txt, i)
            out.append(txt[i:j])
            i = j
            continue
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (txt[j].isalnum() or txt[j] == "_"):
                j += 1
            name = txt[i:j]
            rule = rules.get(name.lower())
            if rule is not None and j < n and txt[j] == "(":
                kind, arg = rule
                if kind == "refuse":
                    raise DialectError(
                        f"{name}() has no faithful spelling in this "
                        "dialect — not unparsable")
                end = _balanced_close(txt, j)
                inner = _rewrite_functions(txt[j + 1:end], rules)
                if kind == "cast":
                    if _top_level_commas(inner) != 0:
                        raise DialectError(
                            f"multi-arg {name}() has no faithful "
                            "spelling in this dialect — not unparsable")
                    out.append(f"CAST({inner} AS {arg})")
                elif kind == "ln_if_unary":
                    fn = "ln" if _top_level_commas(inner) == 0 else name
                    out.append(f"{fn}({inner})")
                elif kind == "append_arg":
                    out.append(f"{name}({inner}, {arg})")
                elif kind == "template":
                    if _top_level_commas(inner) != 0:
                        raise DialectError(
                            f"multi-arg {name}() does not match the "
                            "single-arg rewrite template — not unparsable")
                    out.append(arg.format(inner=inner))
                elif kind == "template_args":
                    tmpl, arity = arg
                    parts = _split_top_args(inner)
                    if len(parts) != arity:
                        raise DialectError(
                            f"{len(parts)}-arg {name}() does not match "
                            f"the {arity}-arg rewrite template — not "
                            "unparsable")
                    out.append(tmpl.format(*parts))
                elif kind == "rename":
                    out.append(f"{arg}({inner})")
                elif kind == "custom":
                    out.append(arg(name, inner))
                elif kind == "custom_tail":
                    # handler also sees the UNREWRITTEN text after the
                    # close paren (lookahead — e.g. the aggregate-vs-
                    # window position check).  A (replacement, consumed)
                    # return ABSORBS `consumed` tail characters into the
                    # replacement (the windowed-collect_list OVER-clause
                    # duplication needs the window spec inside its
                    # emptiness guard).
                    rep = arg(name, inner, txt[end + 1:])
                    if isinstance(rep, tuple):
                        rep, consumed = rep
                        end += consumed
                    out.append(rep)
                else:  # pragma: no cover - rule table is closed
                    raise DialectError(f"unknown dialect rule {kind}")
                i = end + 1
                continue
            out.append(name)
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _top_level_join(txt: str) -> bool:
    """True when the factor text contains a JOIN at paren depth 0 (i.e.
    it is a joined-table expression, not a simple table factor)."""
    depth = 0
    i, n = 0, len(txt)
    while i < n:
        ch = txt[i]
        if ch in ("'", '"', "`"):
            i = _skip_quoted(txt, i)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and txt.startswith(" JOIN ", i):
            return True
        i += 1
    return False


def _fix_extract_field_literal(txt: str) -> str:
    """Catalyst renders EXTRACT with the field as a STRING literal —
    ``extract('MINUTE' FROM x)`` — but the parser's grammar form takes a
    bare identifier: ``extract(MINUTE FROM x)`` (registry-sweep find, a
    parse error at FROM).  Unquote the field only in the exact
    three-segment shape (outside ``extract(`` + literal field + outside
    `` FROM``), so literal CONTENT elsewhere can never be touched."""
    segs = _Unparser._literal_segments(txt)
    out: list[str] = []
    i = 0
    while i < len(segs):
        is_lit, s = segs[i]
        if (not is_lit and s.lower().endswith("extract(")
                and i + 2 < len(segs) and segs[i + 1][0]
                and segs[i + 2][1].startswith(" FROM ")):
            field = segs[i + 1][1]
            inner = field[1:-1]
            if inner.isalpha():
                out.append(s)
                out.append(inner)
                i += 2
                continue
        out.append(s)
        i += 1
    return "".join(out)


def _refuse_int_subscripts(txt: str) -> str:
    """Raw integer subscripts are 0-based on Spark arrays and 1-based in
    DuckDB, and a map with integer keys renders identically — both
    silent-divergence classes, so any Catalyst-rendered ``x[<int>]``
    refuses.  Runs BEFORE the function rewrites (whose own emitted
    subscripts are correct 1-based DuckDB accesses)."""
    for is_lit, s in _Unparser._literal_segments(txt):
        if not is_lit and re.search(r"[\w)\]\"]\[\s*-?\d+\s*\]", s):
            raise DialectError(
                "raw integer subscript is 0-based in Spark and 1-based "
                "in DuckDB — not unparsable")
    return txt


def _map_string_subscripts(txt: str) -> str:
    """DuckDB map subscripts yield a 0/1-element LIST where Spark yields
    the value or NULL — appending ``[1]`` restores value semantics.
    String-literal keys can only be map accesses (array subscripts are
    integers, struct fields render as dotted identifiers).  Runs BEFORE
    the function rewrites so handler-emitted accesses are not
    double-wrapped."""
    segs = _Unparser._literal_segments(txt)
    out: list[str] = []
    for i, (is_lit, s) in enumerate(segs):
        out.append(s)
        if (is_lit and i > 0 and i + 1 < len(segs)
                and segs[i - 1][1].endswith("[")
                and segs[i + 1][1].startswith("]")):
            # close the subscript here and add the list unwrap; the
            # following segment's own '[' stays untouched
            out.append("][1")
    return "".join(out)


def _fix_listagg(txt: str) -> str:
    """``listagg(x[, sep]) WITHIN GROUP (ORDER BY ...)`` →
    ``string_agg(x, sep ORDER BY ...)`` (DuckDB has no ordered-aggregate
    listagg; its string_agg takes the ordering inline, and its default
    separator is ',' where Spark's is '' — so the separator is always
    made explicit)."""
    start = 0
    while True:
        found = _Unparser._find_outside_str(txt, "listagg(", start)
        if found < 0:
            return txt
        # don't match a longer identifier ending in 'listagg'
        if found > 0 and (txt[found - 1].isalnum() or txt[found - 1] == "_"):
            start = found + 1
            continue
        close = _balanced_close(txt, found + len("listagg"))
        args = _split_top_args(txt[found + len("listagg(") : close])
        distinct = ""
        if args and args[0].upper().startswith("DISTINCT "):
            distinct = "DISTINCT "
            args[0] = args[0][len("DISTINCT "):]
        if len(args) == 1:
            args.append("''")
        if len(args) != 2:
            raise DialectError(
                f"{len(args)}-arg listagg() — not unparsable")
        rest = txt[close + 1:]
        order = ""
        m = re.match(r"\s*WITHIN GROUP \(ORDER BY ", rest)
        if m:
            oc = _balanced_close(rest, m.end() - len("(ORDER BY "))
            order = " ORDER BY " + rest[m.end():oc]
            rest = rest[oc + 1:]
        repl = f"string_agg({distinct}{args[0]}, {args[1]}{order})"
        txt = txt[:found] + repl + rest


def _fix_negative_frame_bounds(txt: str) -> str:
    """Spark accepts negative frame offsets (``-3 FOLLOWING`` ≡
    ``3 PRECEDING``) and Catalyst renders them literally; DuckDB rejects
    them loudly.  Rewrite each OVER clause's frame bounds: a bound whose
    expression carries a top-level leading minus (possibly inside CAST
    wrappers) drops the minus and flips PRECEDING↔FOLLOWING."""

    def fix_bound(bound: str) -> str:
        s = bound.strip()
        for kw, flip in (("FOLLOWING", "PRECEDING"),
                         ("PRECEDING", "FOLLOWING")):
            if not s.endswith(" " + kw):
                continue
            body = s[: -len(kw) - 1]
            m = re.match(r"^((?:CAST\()*)\s*-\s*(.*)$", body, re.S)
            if m:
                return f"{m.group(1)}{m.group(2)} {flip}"
            return s
        return s

    out: list[str] = []
    i = 0
    while True:
        j = _Unparser._find_outside_str(txt, "OVER (", i)
        if j < 0:
            out.append(txt[i:])
            return "".join(out)
        close = _balanced_close(txt, j + len("OVER "))
        inner = txt[j + len("OVER (") : close]
        m = re.search(r"\b(ROWS|RANGE|GROUPS) BETWEEN ", inner)
        if m:
            frame = inner[m.end():]
            # the frame clause is the tail of the OVER content; split
            # its two bounds on the single top-level AND
            parts = _split_top_and(frame)
            if len(parts) == 2:
                inner = (inner[: m.end()]
                         + fix_bound(parts[0]) + " AND "
                         + fix_bound(parts[1]))
        out.append(txt[i:j] + "OVER (" + inner + ")")
        i = close + 1


def _split_top_and(txt: str) -> list[str]:
    depth = 0
    i, n = 0, len(txt)
    while i < n:
        ch = txt[i]
        if ch in ("'", '"'):
            i = _skip_quoted(txt, i)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and txt.startswith(" AND ", i):
            return [txt[:i], txt[i + 5:]]
        i += 1
    return [txt]


def _duckdb_token_rewrites(txt: str) -> str:
    """Outside-literal token translations: the ``div`` integer-division
    keyword (DuckDB spells it ``//``, same truncate-toward-zero), the
    ``<=>`` null-safe equality operator (``IS NOT DISTINCT FROM``), and
    Catalyst's typed numeric literal suffixes (``1E-7BD``, ``2L``,
    ``3S``, ``4Y``) that DuckDB's parser rejects."""

    def outside(seg: str) -> str:
        seg = _neg_boundary(seg)
        seg = re.sub(r'(?<![\w"])div(?![\w"])', "//", seg)
        seg = seg.replace("<=>", "IS NOT DISTINCT FROM")
        seg = re.sub(r"(?<![\w.])(\d+(?:\.\d+)?(?:E[+-]?\d+)?)BD\b",
                     r"CAST('\1' AS DECIMAL(38,18))", seg)
        seg = re.sub(r"(?<![\w.])(\d+)L\b", r"CAST(\1 AS BIGINT)", seg)
        seg = re.sub(r"(?<![\w.])(\d+)S\b", r"CAST(\1 AS SMALLINT)", seg)
        seg = re.sub(r"(?<![\w.])(\d+)Y\b", r"CAST(\1 AS TINYINT)", seg)
        return seg

    return "".join(
        s if is_lit else outside(s)
        for is_lit, s in _Unparser._literal_segments(txt))


def _reescape_literals_duckdb(txt: str) -> str:
    """Convert every string literal from Catalyst's rendering convention
    (C-style: backslash doubled, quote as \\') to standard-SQL DuckDB
    form (backslash literal, quote doubled) — found by the exec pass:
    '%\\\\_x' meant pattern %\\_x to Spark but two literal backslashes to
    DuckDB.  MUST run LAST in the DuckDB pipeline: every other rewrite
    walks text in the Catalyst convention."""
    out: list[str] = []
    for is_lit, s in _Unparser._literal_segments(txt):
        if not is_lit or len(s) < 2:
            out.append(s)
            continue
        body = s[1:-1]
        res: list[str] = []
        i, n = 0, len(body)
        while i < n:
            ch = body[i]
            if ch == "\\" and i + 1 < n and body[i + 1] in ("\\", "'"):
                res.append(body[i + 1])
                i += 2
                continue
            if ch == "'" and i + 1 < n and body[i + 1] == "'":
                res.append("'")
                i += 2
                continue
            res.append(ch)
            i += 1
        out.append("'" + "".join(res).replace("'", "''") + "'")
    return "".join(out)


def _like_escape_duckdb(txt: str) -> str:
    """Append ``ESCAPE '\\'`` to LIKE/ILIKE LITERAL patterns for DuckDB:
    Spark's LIKE treats backslash as the DEFAULT escape character, DuckDB
    has none ('%\\_x' matched a literal backslash + any char — found by
    the exec pass).  For patterns without a backslash the clause is a
    no-op, so it is semantics-equalizing in every literal case;
    non-literal patterns are left alone (no rendered occurrence)."""
    segs = _Unparser._literal_segments(txt)
    out: list[str] = []
    i = 0
    while i < len(segs):
        is_lit, s = segs[i]
        out.append(s)
        if (not is_lit and (s.endswith(" LIKE ") or s.endswith(" ILIKE "))
                and i + 1 < len(segs) and segs[i + 1][0]):
            out.append(segs[i + 1][1])
            nxt = (segs[i + 2][1]
                   if i + 2 < len(segs) and not segs[i + 2][0] else "")
            if not nxt.lstrip().upper().startswith("ESCAPE"):
                # Catalyst-convention spelling of a single backslash —
                # _reescape_literals_duckdb (which runs after) converts
                # it to the DuckDB form '\'
                out.append(" ESCAPE '\\\\'")
            i += 2
            continue
        i += 1
    return "".join(out)


def _render_schema_exact(b: _Block) -> str:
    """Render for schema-sensitive contexts (query root, set-op branches):
    a select-less USING-join block materializes its recorded node.output()
    so the emitted arity/order matches the plan.  Derived-table contexts
    keep the bare ``*`` (the parent resolves names against the deduped
    USING schema, which is value-identical under INNER)."""
    if b.select is None and b.using_out is not None:
        b.select = b.using_out
    return b.render()


class _Unparser:
    def __init__(self, dialect: Dialect, session_tz: str = "UTC",
                 validated: bool = False):
        self.dialect = dialect
        self.session_tz = session_tz
        # True when the caller will run the full round-trip schema/type
        # validation on the emitted text — repairs may then lean on that
        # safety net (see _fix_cast_drops' lambda adjudication)
        self._validated = validated
        self._n = 0
        self._cte_names: dict[int, str] = {}  # cteId -> WITH-clause name
        # (qual, name) attribute references hidden behind generated
        # derived-table aliases (see _hide_quals)
        self._hidden_pairs: set[tuple[str, str]] = set()
        # lossy struct-name renders recorded by _check_tree, adjudicated
        # against the actual Catalyst text in _expr_sql
        self._struct_drop_candidates: list[tuple[str, str]] = []
        # lossy complex-cast renders (child text, target type SQL) —
        # same record-then-adjudicate protocol
        self._cast_drop_candidates: list[tuple[str, str]] = []
        # lossy from_csv/from_json renders (render, schema DDL, options)
        self._schema_fn_drop_candidates: list[
            tuple[str, str, list[tuple[str, str]]]] = []
        # duckdb-only tree-informed render repairs (render, rebuilt):
        # fractional→integral cast trunc()-wrapping, timestamp-operand
        # unix_timestamp — cases where the TEXT is ambiguous but the
        # TREE has the exact types
        self._duckdb_render_repairs: list[tuple[str, str]] = []

    def _alias(self) -> str:
        self._n += 1
        return f"t{self._n}"

    # -- helpers over py4j Scala collections ------------------------------
    @staticmethod
    def _seq(jseq):
        return [jseq.apply(i) for i in range(jseq.size())]

    # Expression.sql renderings that do NOT re-parse as SQL (Catalyst
    # prints an internal spelling): plan-hosted subquery expressions.
    # The reference unparser refuses the analogous Expr shapes (expr.rs
    # unsupported-expression errors).  Lambda renderings
    # (lambdafunction(...)) are handled separately: _render_lambda_text
    # rewrites them into `v -> body` arrow syntax from the tree, refusing
    # on any text/tree misalignment.
    _UNPARSABLE_EXPR_MARKERS = ("scalarsubquery(", "exists#",
                                "listquery(", "in(listquery")

    # Expression classes whose Expression.sql SILENTLY DROPS the
    # ignoreNulls flag (renders first(x) for first(x, true)) — found by
    # the registry round-trip sweep as a wrong-VALUES divergence, the
    # worst class.  Refused by tree inspection, not text.
    _IGNORE_NULLS_CLASSES = ("First", "Last", "NthValue", "Lead", "Lag",
                             "AnyValue")

    def _check_tree(self, e) -> None:
        stack = [e]
        while stack:
            n = stack.pop()
            cls = n.getClass().getSimpleName()
            if cls in self._IGNORE_NULLS_CLASSES:
                try:
                    ign = bool(n.ignoreNulls())
                except Exception:  # noqa: BLE001 - variant without the flag
                    ign = False
                if ign:
                    raise DialectError(
                        "IGNORE NULLS is dropped by Expression.sql — "
                        f"not unparsable: {n.toString()[:100]}")
            elif cls == "HyperLogLogPlusPlus":
                # .sql() renders approx_count_distinct(x) and DROPS a
                # non-default rsd — the re-parsed sketch silently uses
                # 0.05 and estimates differently (registry-sweep find).
                try:
                    lossy = abs(float(n.relativeSD()) - 0.05) > 1e-12
                except Exception:  # noqa: BLE001
                    lossy = True
                if lossy:
                    raise DialectError(
                        "approx_count_distinct rsd is dropped by "
                        f"Expression.sql: {n.toString()[:100]}")
            elif cls in ("Cast", "TryCast", "AnsiCast"):
                if self.dialect.name == "duckdb":
                    # Fractional → integral CAST semantics DIVERGE:
                    # Spark truncates toward zero, DuckDB rounds
                    # half-away (382273.9375 → 382273 vs 382274 — found
                    # by the sweep's DuckDB-execution pass).  Fractional
                    # → string also formats differently.  No faithful
                    # DuckDB spelling of Spark's cast — refuse.
                    try:
                        src = n.child().dataType().sql().upper()
                        dst = n.dataType().sql().upper()
                    except Exception:  # noqa: BLE001
                        src = dst = ""
                    frac = (src in ("FLOAT", "DOUBLE")
                            or src.startswith("DECIMAL"))
                    if frac and dst == "STRING":
                        raise DialectError(
                            f"CAST({src} AS {dst}) truncates in Spark "
                            "but rounds/reformats in DuckDB — not "
                            "unparsable in this dialect")
                    if frac and dst in ("TINYINT", "SMALLINT", "INT",
                                        "BIGINT"):
                        # Fractional → integral CAST semantics diverge
                        # (Spark truncates toward zero, DuckDB rounds
                        # half-away) but are REPAIRABLE (r11):
                        # CAST(trunc(x) AS T) is truncation in DuckDB
                        # too (probed: trunc(2.7)=2, trunc(-2.7)=-2,
                        # decimals included).  Non-finite doubles still
                        # differ (Spark NaN→0; DuckDB errors LOUDLY on
                        # the cast — never silent).  Record the repair;
                        # the fix pass anchors the unique render.
                        try:
                            child_sql = n.child().sql()
                            render = n.sql()
                        except Exception as e:  # noqa: BLE001
                            raise DialectError(
                                f"cast render unavailable: {e}")
                        # try_cast must STAY try: DuckDB TRY_CAST NULLs
                        # on overflow/NaN exactly like Spark try_cast
                        # (rebuilding it as a plain CAST turned the
                        # NULL into a loud error — exec-pass find on
                        # fn_edge_lossy_casts' 1e19 double).  Spark 4
                        # analyzes try_cast as Cast(evalMode=TRY), not
                        # a separate class — read the mode.
                        try:
                            is_try = (n.evalMode().toString()
                                      .upper() == "TRY")
                        except Exception:  # noqa: BLE001 - older trees
                            is_try = cls == "TryCast"
                        kw = "TRY_CAST" if is_try else "CAST"
                        self._duckdb_render_repairs.append(
                            (render,
                             f"{kw}(trunc({child_sql}) AS {dst})"))
                    # Spark numeric↔timestamp CAST is epoch-seconds
                    # arithmetic; DuckDB has NO such cast at all
                    # ("Unimplemented type for cast", found by the
                    # sweep's execution pass as loud type-blind binder
                    # errors).  DuckDB spells the semantics
                    # to_timestamp()/epoch(), which a text rewrite
                    # cannot target without the operand type — refuse
                    # from the tree, where the types are exact.
                    def _numt(t: str) -> bool:
                        return (t in ("TINYINT", "SMALLINT", "INT",
                                      "BIGINT", "FLOAT", "DOUBLE")
                                or t.startswith("DECIMAL"))
                    if ((_numt(src) and dst.startswith("TIMESTAMP"))
                            or (src.startswith("TIMESTAMP")
                                and _numt(dst))):
                        raise DialectError(
                            f"CAST({src} AS {dst}) is Spark "
                            "epoch-seconds semantics with no DuckDB "
                            "CAST spelling (DuckDB needs to_timestamp()"
                            "/epoch()) — not unparsable in this dialect")
                # Catalyst renders a Cast to a COMPLEX type (array/map/
                # struct) as just its child — CAST(array(1,2) AS
                # ARRAY<DOUBLE>).sql() == 'array(1, 2)' — so the target
                # type is silently dropped and the re-parse computes
                # different element types (found by the r9 registry
                # sweep as a wrong-VALUES divergence: the 5th silent-
                # arg-drop class).  Scalar casts render correctly.
                # Same-type no-op casts are harmless and pass.
                try:
                    dt = n.dataType().sql().upper()
                    if (dt.startswith(("ARRAY", "MAP", "STRUCT"))
                            and not n.dataType().sameType(
                                n.child().dataType())
                            and n.sql() == n.child().sql()):
                        if self.dialect.name == "duckdb":
                            # r12: repairable in DuckDB too — the target
                            # type re-spells as T[]/MAP(K,V)/STRUCT(..)
                            # (probed: DuckDB complex casts are
                            # elementwise and NULL-preserving exactly
                            # like Spark's) after refusing any nested
                            # scalar pair whose semantics diverge
                            # (frac→int/string, numeric↔timestamp).
                            _require_duck_cast_pair(
                                n.child().dataType(), n.dataType())
                            self._cast_drop_candidates.append(
                                (n.sql(), _duck_type_sql(n.dataType())))
                        elif self.dialect.name != "spark":
                            # the repair re-emits the target type in
                            # SPARK type syntax (ARRAY<DOUBLE>), which
                            # other dialects don't parse — refuse there
                            raise DialectError(
                                "complex-type CAST target is dropped by "
                                f"Expression.sql: {n.toString()[:100]}")
                        else:
                            # Spark dialect: repairable — record the
                            # lossy render; _fix_cast_drops wraps its
                            # unique occurrence back into an explicit
                            # CAST (same adjudication protocol as the
                            # struct-name repair: candidates in
                            # replacement subtrees that never render are
                            # ignored, ambiguous multi-occurrence
                            # anchors refuse).
                            self._cast_drop_candidates.append(
                                (n.sql(), n.dataType().sql()))
                except DialectError:
                    raise
                except Exception:  # noqa: BLE001 - variant w/o accessors
                    pass
            elif cls in ("VariantGet", "TryVariantGet"):
                # .sql() renders variant_get(v, path) and DROPS the
                # target type — the re-parse returns raw VARIANT values
                # instead of the extracted scalars (registry-sweep find).
                raise DialectError(
                    "variant_get target type is dropped by "
                    f"Expression.sql: {n.toString()[:100]}")
            elif cls in ("Multiply", "Divide", "MultiplyDTInterval",
                         "MultiplyYMInterval", "DivideDTInterval",
                         "DivideYMInterval") \
                    and self.dialect.name == "duckdb":
                # Spark multiplies/divides intervals by FRACTIONAL
                # scalars; DuckDB's INTERVAL arithmetic only takes
                # integers ("no function matches *(INTERVAL, DECIMAL)"
                # — exec-pass find on fn_edge_datetime_arith_matrix).
                # Integer multipliers translate fine; fractional ones
                # refuse from the tree where the types are exact.
                try:
                    kinds = [n.left().dataType().sql().upper(),
                             n.right().dataType().sql().upper()]
                except Exception:  # noqa: BLE001 - not a binary node
                    kinds = []
                if any(k.startswith("INTERVAL") for k in kinds) and any(
                        k in ("FLOAT", "DOUBLE") or k.startswith("DECIMAL")
                        for k in kinds):
                    raise DialectError(
                        "INTERVAL × fractional scalar has no DuckDB "
                        "spelling — not unparsable")
            elif cls in ("UnixTimestamp", "ToUnixTimestamp") \
                    and self.dialect.name == "duckdb":
                # Spark unix_timestamp(x, fmt) IGNORES the format when x
                # is already a TIMESTAMP/DATE — but the operand type is
                # invisible in the rendered text, and the strptime
                # translation would try to PARSE the timestamp's varchar
                # rendering with the (unrelated) format (cb_q23 exec
                # find: fractional/longer renderings fail loudly).
                # Repair from the tree: datetime operands go straight to
                # epoch(); string operands stay for the textual
                # strptime handler.
                try:
                    ct = n.children().apply(0).dataType().sql().upper()
                    if ct.startswith(("TIMESTAMP", "DATE")):
                        child_sql = n.children().apply(0).sql()
                        self._duckdb_render_repairs.append(
                            (n.sql(),
                             f"CAST(floor(epoch({child_sql})) "
                             "AS BIGINT)"))
                except Exception as e:  # noqa: BLE001 - accessor drift
                    raise DialectError(
                        f"unix_timestamp operand unreadable: {e}")
            elif cls in ("CsvToStructs", "JsonToStructs"):
                # The SEVENTH silent-arg-drop class (r11 find):
                # from_csv/from_json .sql() renders ONLY the input —
                # from_csv('1,a', 'x INT, y STRING').sql() is
                # "from_csv('1,a')" — dropping the SCHEMA argument (the
                # re-parse is a loud arity error) and any options map.
                # Both are recoverable from the tree: dataType().sql()
                # is a valid DDL schema string and options() carries
                # the map — record a repair candidate (Spark dialect;
                # no remote spelling exists elsewhere).
                fn = ("from_csv" if cls == "CsvToStructs"
                      else "from_json")
                if self.dialect.name != "spark":
                    raise DialectError(
                        f"{fn}() schema argument is dropped by "
                        "Expression.sql — no faithful spelling in "
                        "this dialect")
                try:
                    ddl = n.dataType().sql()
                    opts = self._scala_map_items(n.options())
                except Exception as e:  # noqa: BLE001 - accessor drift
                    raise DialectError(
                        f"{fn}() schema unrecoverable: {e}")
                if "'" in ddl or "\\" in ddl or any(
                        "'" in k or "\\" in k or "'" in v or "\\" in v
                        for k, v in opts):
                    raise DialectError(
                        f"{fn}() schema/options not quotable")
                self._schema_fn_drop_candidates.append(
                    (n.sql(), ddl, opts))
            elif cls in ("StructsToJson", "StructsToCsv"):
                # Same drop class, options-only: to_json(x, map(...))
                # renders to_json(x) — the re-parse SILENTLY formats
                # with default options (a value divergence, not an
                # arity error).  Empty options render faithfully.
                fn = "to_json" if cls == "StructsToJson" else "to_csv"
                try:
                    opts = self._scala_map_items(n.options())
                except Exception as e:  # noqa: BLE001 - accessor drift
                    raise DialectError(f"{fn}() options unreadable: {e}")
                if opts:
                    if self.dialect.name != "spark":
                        raise DialectError(
                            f"{fn}() options are dropped by "
                            "Expression.sql — no faithful spelling in "
                            "this dialect")
                    if any("'" in k or "\\" in k or "'" in v
                           or "\\" in v for k, v in opts):
                        raise DialectError(
                            f"{fn}() options not quotable")
                    self._schema_fn_drop_candidates.append(
                        (n.sql(), None, opts))
            elif cls == "CreateNamedStruct":
                # The SIXTH Catalyst silent-arg-drop class (r10 find):
                # struct(x AS w1).sql() renders 'struct(x)' — the field
                # NAME is gone, so the re-parse names the field after
                # the value expression instead.  VALUES are identical,
                # which is why the row-comparing sweep never caught it;
                # the drift is in the nested schema, visible only when
                # a downstream reference to the declared name fails.
                # Refuse whenever the rendered form is the name-less
                # struct(...) and a declared name would not be re-derived
                # by the re-parse's own naming rule (attribute/field →
                # its bare name, anything else → positional colN).
                # named_struct('w1', x) renders faithfully and passes.
                # A lossy node may sit in an analyzer-internal
                # REPLACEMENT subtree that never renders (str_to_map's
                # lowering carries a struct(k, v, ...) the final text
                # spells as str_to_map(...)), so the candidate is only
                # recorded here; _expr_sql refuses iff its rendering
                # actually occurs in the emitted text.
                try:
                    nsql = n.sql()
                    if nsql.lower().startswith("struct("):
                        ch0 = n.children()
                        names: list[str] = []
                        lossy = False
                        for j in range(0, ch0.size(), 2):
                            name_e, val = ch0.apply(j), ch0.apply(j + 1)
                            declared = str(name_e.eval(None))
                            names.append(declared)
                            vs = val.sql().replace("`", "")
                            import re as _re

                            if _re.fullmatch(
                                    r"[A-Za-z_]\w*(\.[A-Za-z_]\w*)*", vs):
                                natural = vs.rsplit(".", 1)[-1]
                            else:
                                natural = f"col{j // 2 + 1}"
                            if declared != natural:
                                lossy = True
                        if lossy:
                            self._struct_drop_candidates.append(
                                (nsql, names))
                except Exception:  # noqa: BLE001 - variant w/o accessors
                    pass
            ch = n.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))

    @staticmethod
    def _outside_literals(txt: str) -> str:
        """The rendered text with single-quoted string literals blanked,
        so marker matching can't fire on literal CONTENT (r8 review
        find: lit("call exists(now)") spuriously refused).  '' escapes
        stay inside the literal, same walk as _requote."""
        out, i, n, in_str = [], 0, len(txt), False
        while i < n:
            ch = txt[i]
            if in_str:
                if ch == "\\" and i + 1 < n:
                    i += 1  # C-style escape: next char stays literal
                elif ch == "'":
                    if i + 1 < n and txt[i + 1] == "'":
                        i += 1
                    else:
                        in_str = False
            elif ch == "'":
                in_str = True
            else:
                out.append(ch)
            i += 1
        return "".join(out)

    @staticmethod
    def _literal_segments(txt: str) -> list[tuple[bool, str]]:
        """Split rendered text into (is_literal, segment) runs using the
        same single-quote walk as _outside_literals, but KEEPING every
        character — so rewrites can be applied to the outside-literal
        segments only and the text reassembled verbatim (r9 advice find:
        _regroup substituted inside string literals)."""
        segs: list[tuple[bool, str]] = []
        buf: list[str] = []
        i, n, in_str = 0, len(txt), False
        while i < n:
            ch = txt[i]
            if in_str:
                buf.append(ch)
                if ch == "\\" and i + 1 < n:
                    buf.append(txt[i + 1])
                    i += 1  # C-style escape: next char stays literal
                elif ch == "'":
                    if i + 1 < n and txt[i + 1] == "'":
                        buf.append(txt[i + 1])
                        i += 1
                    else:
                        segs.append((True, "".join(buf)))
                        buf, in_str = [], False
            elif ch == "'":
                if buf:
                    segs.append((False, "".join(buf)))
                buf, in_str = [ch], True
            else:
                buf.append(ch)
            i += 1
        if buf:
            segs.append((in_str, "".join(buf)))
        return segs

    # Plan-hosted subquery EXPRESSION nodes (reference unparser handles
    # these in plan.rs subquery reconstruction): Expression.sql renders
    # an internal placeholder (scalarsubquery()/listquery()/exists#n)
    # that never re-parses, so subquery-bearing trees are rendered by
    # _render_subq_expr below — the inner PLAN is unparsed recursively
    # and spliced as (SELECT ...).  Correlated subqueries refuse (the
    # inner plan would render outer(...) references).
    _SUBQ_EXPR_CLASSES = ("ScalarSubquery", "Exists", "InSubquery",
                          "ListQuery")

    def _tree_has_subquery(self, e) -> bool:
        stack = [e]
        while stack:
            n = stack.pop()
            if n.getClass().getSimpleName() in self._SUBQ_EXPR_CLASSES:
                return True
            ch = n.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        return False

    def _subplan_sql(self, subq, what: str) -> str:
        """Unparse a subquery-expression's inner plan.  CORRELATED
        subqueries (reference unparser/plan.rs renders these as plain
        correlated column references) are handled by unwrapping the
        ``outer(q.name)`` spelling Catalyst renders for each outer
        reference: the bare ``q.name`` is exactly SQL's correlation
        syntax, resolvable against the outer block's factor ``q``.

        Safety: every outer attribute must render with a single-part
        qualifier that is NOT hidden behind a generated derived alias
        (a hidden qual would strip to a bare name, which the INNER
        scope could capture — the one silent-rebinding hazard; refuse).
        If the outer factor is derived away AFTER this text freezes the
        reference dangles and re-analysis fails LOUDLY — the inner
        scope cannot capture ``q.name`` because the original analysis
        proved the inner scope does not resolve it (else Catalyst would
        have bound it inner-first, not as an outer reference)."""
        oa = subq.outerAttrs()
        for i in range(oa.size()):
            a = oa.apply(i)
            if a.getClass().getSimpleName() != "AttributeReference":
                raise DialectError(
                    f"correlated {what} over a non-attribute outer "
                    "reference — not unparsable")
            qv = a.qualifier()
            if qv.size() != 1:
                raise DialectError(
                    f"correlated {what} outer reference renders "
                    "unqualified — inner-scope capture risk, refused")
            if (qv.apply(0), a.name()) in self._hidden_pairs:
                raise DialectError(
                    f"correlated {what} outer qualifier is hidden behind "
                    "a derived alias — not unparsable")
        inner = _render_schema_exact(self.visit(subq.plan()))
        if oa.size() == 0:
            return inner
        # re-check AFTER the inner visit: a derive inside the subquery
        # may have hidden the same (qual, name) pair, in which case the
        # outer() wrapper was already stripped to a BARE name — unwrapping
        # it would let the inner scope capture the reference.
        for i in range(oa.size()):
            a = oa.apply(i)
            if (a.qualifier().apply(0), a.name()) in self._hidden_pairs:
                raise DialectError(
                    f"correlated {what} outer qualifier was hidden by an "
                    "inner derived alias — not unparsable")
        import re as _re

        ident = r"(?:`[^`]+`|\"[^\"]+\"|[A-Za-z_][A-Za-z_0-9]*)"
        pat = _re.compile(rf"\bouter\(({ident}(?:\.{ident})*)\)")
        inner = "".join(
            s if is_lit else pat.sub(r"\1", s)
            for is_lit, s in self._literal_segments(inner))
        if "outer(" in self._outside_literals(inner).lower():
            raise DialectError(
                f"correlated {what} outer reference did not match the "
                "known rendering — not unparsable")
        return inner

    def _render_subq_expr(self, e) -> str:
        """Render an expression tree CONTAINING subquery expressions:
        subquery nodes splice their recursively-unparsed plan; boolean /
        binary-operator spine nodes recurse; subquery-free subtrees fall
        back to the Expression.sql path."""
        cls = e.getClass().getSimpleName()
        if not self._tree_has_subquery(e):
            return self._expr_sql(e)
        if cls == "ScalarSubquery":
            return f"({self._subplan_sql(e, 'scalar subquery')})"
        if cls == "Exists":
            return f"EXISTS ({self._subplan_sql(e, 'EXISTS subquery')})"
        if cls == "InSubquery":
            vals = [self._render_subq_expr(v) for v in self._seq(e.values())]
            lhs = vals[0] if len(vals) == 1 else "(" + ", ".join(vals) + ")"
            return f"{lhs} IN ({self._subplan_sql(e.query(), 'IN subquery')})"
        if cls == "Not":
            return f"(NOT {self._render_subq_expr(e.child())})"
        if cls in ("And", "Or"):
            kw = "AND" if cls == "And" else "OR"
            return (f"({self._render_subq_expr(e.left())} {kw} "
                    f"{self._render_subq_expr(e.right())})")
        if cls == "Alias":
            q = self.dialect.identifier_quote
            name = e.name()
            if q in name or "`" in name:
                raise DialectError(f"alias {name!r} not quotable")
            return f"{self._render_subq_expr(e.child())} AS {q}{name}{q}"
        if cls in ("Cast", "TryCast", "AnsiCast"):
            # Tree-faithful render carries the SAME DuckDB semantics
            # checks _check_tree applies on the textual path (r11
            # ADVICE: the old plain-CAST render silently ROUNDED a
            # fractional→integral cast over a subquery in DuckDB where
            # Spark truncates).  Here the repair needs no anchoring —
            # the text is built from the tree directly.
            inner_txt = self._render_subq_expr(e.child())
            dst = e.dataType().sql()
            try:
                is_try = e.evalMode().toString().upper() == "TRY"
            except Exception:  # noqa: BLE001 - older trees
                is_try = cls == "TryCast"
            kw = "TRY_CAST" if is_try else "CAST"
            if self.dialect.name == "duckdb":
                try:
                    src = e.child().dataType().sql().upper()
                except Exception as exc:  # noqa: BLE001 - accessor drift
                    raise DialectError(f"cast operand unreadable: {exc}")
                dstu = dst.upper()
                frac = (src in ("FLOAT", "DOUBLE")
                        or src.startswith("DECIMAL"))
                if frac and dstu == "STRING":
                    raise DialectError(
                        f"CAST({src} AS {dstu}) truncates in Spark but "
                        "rounds/reformats in DuckDB — not unparsable in "
                        "this dialect")
                if frac and dstu in ("TINYINT", "SMALLINT", "INT",
                                     "BIGINT"):
                    return f"{kw}(trunc({inner_txt}) AS {dst})"
                if dstu.startswith(("ARRAY", "MAP", "STRUCT")):
                    # r12: re-spell the target in DuckDB type syntax
                    # (elementwise semantics probed identical), refusing
                    # divergent nested scalar pairs
                    _require_duck_cast_pair(e.child().dataType(),
                                            e.dataType())
                    return (f"{kw}({inner_txt} AS "
                            f"{_duck_type_sql(e.dataType())})")

                def _numt(t: str) -> bool:
                    return (t in ("TINYINT", "SMALLINT", "INT", "BIGINT",
                                  "FLOAT", "DOUBLE")
                            or t.startswith("DECIMAL"))
                if ((_numt(src) and dstu.startswith("TIMESTAMP"))
                        or (src.startswith("TIMESTAMP") and _numt(dstu))):
                    raise DialectError(
                        f"CAST({src} AS {dstu}) is Spark epoch-seconds "
                        "semantics with no DuckDB CAST spelling — not "
                        "unparsable in this dialect")
            return f"{kw}({inner_txt} AS {dst})"
        if cls in ("IsNull", "IsNotNull"):
            kw = "IS NULL" if cls == "IsNull" else "IS NOT NULL"
            return f"({self._render_subq_expr(e.child())} {kw})"
        if cls == "In":
            vals = [self._render_subq_expr(v) for v in self._seq(e.list())]
            return (f"({self._render_subq_expr(e.value())} IN "
                    f"({', '.join(vals)}))")
        if cls == "Between":
            return (f"({self._render_subq_expr(e.input())} BETWEEN "
                    f"{self._render_subq_expr(e.lower())} AND "
                    f"{self._render_subq_expr(e.upper())})")
        if cls == "CaseWhen":
            parts = ["CASE"]
            for br in self._seq(e.branches()):
                parts.append(f"WHEN {self._render_subq_expr(br._1())} "
                             f"THEN {self._render_subq_expr(br._2())}")
            ev = e.elseValue()
            if ev.isDefined():
                parts.append(f"ELSE {self._render_subq_expr(ev.get())}")
            parts.append("END")
            return "(" + " ".join(parts) + ")"
        # generic binary operator (comparisons, arithmetic): symbol() is
        # defined on every Catalyst BinaryOperator.  Everything ELSE on
        # a subquery spine refuses here — including the repair-needing
        # classes _check_tree handles on the textual path
        # (UnixTimestamp, from_csv/from_json, IGNORE NULLS, ...), whose
        # spine occurrence would otherwise render lossily (r11 ADVICE).
        if cls in ("Multiply", "Divide", "MultiplyDTInterval",
                   "MultiplyYMInterval", "DivideDTInterval",
                   "DivideYMInterval") and self.dialect.name == "duckdb":
            try:
                kinds = [e.left().dataType().sql().upper(),
                         e.right().dataType().sql().upper()]
            except Exception:  # noqa: BLE001 - not a binary node
                kinds = []
            if any(k.startswith("INTERVAL") for k in kinds) and any(
                    k in ("FLOAT", "DOUBLE") or k.startswith("DECIMAL")
                    for k in kinds):
                raise DialectError(
                    "INTERVAL × fractional scalar has no DuckDB "
                    "spelling — not unparsable")
        try:
            sym = e.symbol()
            left, right = e.left(), e.right()
        except Exception:  # noqa: BLE001 - not a binary operator
            raise DialectError(
                f"subquery under unsupported expression node {cls}")
        return (f"({self._render_subq_expr(left)} {sym} "
                f"{self._render_subq_expr(right)})")

    # -- lambda rendering ---------------------------------------------------
    # Catalyst renders higher-order-function lambdas as
    # ``lambdafunction(BODY, namedlambdavariable(), ...)`` with every
    # variable spelled identically — internal text that never re-parses.
    # The TREE retains variable identity (NamedLambdaVariable exprIds), so
    # the spans are rewritten into ``(v1, v2) -> BODY`` arrow syntax:
    # fresh variable names are assigned per lambda and each
    # namedlambdavariable() occurrence in the body text is substituted by
    # occurrence order against an in-order traversal of the body tree
    # (Expression.sql renders children left-to-right, so text order ==
    # tree order).  Any misalignment — count mismatch, nested lambda,
    # outer-variable capture — refuses; never a silent guess.

    @staticmethod
    def _find_outside_str(txt: str, needle: str, start: int) -> int:
        """txt.find(needle, start) skipping single-quoted literals."""
        i, n, in_str = start, len(txt), False
        while i < n:
            ch = txt[i]
            if in_str:
                if ch == "\\" and i + 1 < n:
                    i += 1
                elif ch == "'":
                    if i + 1 < n and txt[i + 1] == "'":
                        i += 1
                    else:
                        in_str = False
            elif ch == "'":
                in_str = True
            elif txt.startswith(needle, i):
                return i
            i += 1
        return -1

    @staticmethod
    def _balanced_end(txt: str, lparen: int) -> int:
        """Index just past the ')' matching the '(' at ``lparen``."""
        depth, i, n, in_str = 0, lparen, len(txt), False
        while i < n:
            ch = txt[i]
            if in_str:
                if ch == "\\" and i + 1 < n:
                    i += 1
                elif ch == "'":
                    if i + 1 < n and txt[i + 1] == "'":
                        i += 1
                    else:
                        in_str = False
            elif ch == "'":
                in_str = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return i + 1
            i += 1
        raise DialectError("unbalanced parentheses in rendered expression")

    @staticmethod
    def _split_top_args(txt: str) -> list[str]:
        """Split argument text on top-level commas (paren/string aware)."""
        args, depth, in_str, cur = [], 0, False, []
        i, n = 0, len(txt)
        while i < n:
            ch = txt[i]
            if in_str:
                cur.append(ch)
                if ch == "\\" and i + 1 < n:
                    cur.append(txt[i + 1])
                    i += 1
                elif ch == "'":
                    if i + 1 < n and txt[i + 1] == "'":
                        cur.append("'")
                        i += 1
                    else:
                        in_str = False
            elif ch == "'":
                in_str = True
                cur.append(ch)
            elif ch == "(":
                depth += 1
                cur.append(ch)
            elif ch == ")":
                depth -= 1
                cur.append(ch)
            elif ch == "," and depth == 0:
                args.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
            i += 1
        if cur:
            args.append("".join(cur).strip())
        return args

    def _render_lambda_text(self, e) -> str:
        # in-order list of LambdaFunction nodes, NOT descending into their
        # bodies (nested lambdas refuse at the body-text check below)
        lams = []

        def collect(n):
            if n.getClass().getSimpleName() == "LambdaFunction":
                lams.append(n)
                return
            ch = n.children()
            for i in range(ch.size()):
                collect(ch.apply(i))

        collect(e)
        txt = e.sql()
        out, i, k = [], 0, 0
        while True:
            j = self._find_outside_str(txt, "lambdafunction(", i)
            if j < 0:
                out.append(txt[i:])
                break
            out.append(txt[i:j])
            end = self._balanced_end(txt, j + len("lambdafunction"))
            inner = txt[j + len("lambdafunction("):end - 1]
            args = self._split_top_args(inner)
            if k >= len(lams):
                raise DialectError(
                    "lambda text/tree misalignment — not unparsable")
            lam = lams[k]
            k += 1
            lvars = self._seq(lam.arguments())
            if len(args) != 1 + len(lvars) or any(
                    a != "namedlambdavariable()" for a in args[1:]):
                raise DialectError(
                    "unexpected lambdafunction rendering shape — "
                    f"not unparsable: {inner[:80]}")
            body_txt = args[0]
            if self._find_outside_str(body_txt, "lambdafunction(", 0) >= 0:
                raise DialectError(
                    "nested lambda rendering is ambiguous — not unparsable")
            # occurrence order of variables in the body tree
            order: list[int] = []

            def walk_body(n):
                cls = n.getClass().getSimpleName()
                if cls == "NamedLambdaVariable":
                    order.append(n.exprId().id())
                    return
                if cls == "LambdaFunction":
                    raise DialectError(
                        "nested lambda rendering is ambiguous — "
                        "not unparsable")
                ch = n.children()
                for idx in range(ch.size()):
                    walk_body(ch.apply(idx))

            walk_body(lam.function())
            # Fresh-name hygiene (r9 advice find): a real column literally
            # named lv1 inside the body would be captured by the generated
            # arrow variable on re-parse — a silent value change schema
            # validation can't see.  Bump the candidate until it collides
            # with nothing in the body's outside-literal text.
            import re as _re

            body_idents = self._outside_literals(body_txt)

            def _fresh(base: str) -> str:
                cand = base
                while _re.search(rf"\b{_re.escape(cand)}\b", body_idents):
                    cand += "_"
                return cand

            names = {v.exprId().id():
                     _fresh(f"lv{k}_{idx}" if len(lvars) > 1 else f"lv{k}")
                     for idx, v in enumerate(lvars)}
            pieces = body_txt.split("namedlambdavariable()")
            if len(pieces) - 1 != len(order) or any(
                    oid not in names for oid in order):
                raise DialectError(
                    "lambda variable occurrences do not align with the "
                    "tree (outer capture or literal collision) — "
                    "not unparsable")
            body = "".join(
                p + (names[order[n]] if n < len(order) else "")
                for n, p in enumerate(pieces))
            argtxt = ", ".join(names[v.exprId().id()] for v in lvars)
            if len(lvars) > 1:
                argtxt = f"({argtxt})"
            out.append(f"{argtxt} -> {body}")
            i = end
        if k != len(lams):
            raise DialectError(
                "lambda text/tree misalignment — not unparsable")
        return "".join(out)

    def _tree_has_lambda(self, e) -> bool:
        stack = [e]
        while stack:
            n = stack.pop()
            if n.getClass().getSimpleName() == "LambdaFunction":
                return True
            ch = n.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        return False

    def _expr_sql(self, e) -> str:
        # The candidate lists are PER-CALL state: _render_subq_expr /
        # _subplan_sql re-enter _expr_sql on the same instance (r11
        # ADVICE find — the old reset-at-entry wiped an outer call's
        # recorded repairs, so a spine-node repair was silently dropped,
        # and an inner call's leftovers were re-applied by the outer fix
        # pass, spuriously refusing).  Save/restore makes every nesting
        # level see exactly its own candidates.
        saved = (self._struct_drop_candidates, self._cast_drop_candidates,
                 self._schema_fn_drop_candidates, self._duckdb_render_repairs)
        self._struct_drop_candidates = []
        self._cast_drop_candidates = []
        self._schema_fn_drop_candidates = []
        self._duckdb_render_repairs = []
        try:
            return self._expr_sql_inner(e)
        finally:
            (self._struct_drop_candidates, self._cast_drop_candidates,
             self._schema_fn_drop_candidates,
             self._duckdb_render_repairs) = saved

    def _expr_sql_inner(self, e) -> str:
        if self._tree_has_subquery(e):
            # Spine nodes are rendered tree-faithfully by
            # _render_subq_expr, which carries its OWN dialect checks
            # for the repairable/refusable spine classes (Cast,
            # interval arithmetic) and refuses every unlisted class —
            # subquery-free subtrees recurse into _expr_sql, where the
            # full _check_tree + fix protocol runs per nesting level.
            # The old shape (_check_tree here + outer fix passes over
            # the spliced text) double-counted subtree candidates the
            # nested calls had already repaired (r11 ADVICE).
            return self._strip_hidden_quals(self._render_subq_expr(e))
        self._check_tree(e)
        if self._tree_has_lambda(e):
            txt = self._render_lambda_text(e)
            try:
                raw = e.sql()
            except Exception:  # noqa: BLE001 - render errors surface later
                raw = txt
        else:
            txt = e.sql()
            raw = None
        txt = self._fix_struct_drops(e, txt)
        txt = self._fix_cast_drops(txt, raw=raw)
        txt = self._fix_schema_fn_drops(txt)
        low = self._outside_literals(txt).lower()
        for marker in self._UNPARSABLE_EXPR_MARKERS:
            if marker in low:
                raise DialectError(
                    f"expression does not re-parse as SQL: {txt[:120]}")
        if any(k + "(" in low for k in _CATALYST_INTERNAL_FN_RULES):
            txt = _rewrite_functions(txt, _CATALYST_INTERNAL_FN_RULES)
        if "extract(" in low:
            txt = _fix_extract_field_literal(txt)
        return self._strip_hidden_quals(
            _requote(txt, self.dialect.identifier_quote))

    def _fix_struct_drops(self, e, txt: str) -> str:
        """The SIXTH Catalyst silent-arg-drop class (r10 find):
        CreateNamedStruct.sql drops ALIASED field names —
        ``struct(x AS w1)`` renders ``struct(x)``, so the re-parse
        names the field after the value expression instead.  VALUES
        are identical (why the row-comparing sweep never saw it); the
        drift lives in the nested schema and only errs loudly when a
        downstream reference uses the declared name.  _check_tree
        records candidates; each whose lossy spelling actually occurs
        in the text is REWRITTEN to the faithful named_struct form
        (names from the tree, value spellings reused from the lossy
        render).  A candidate that rendered but is textually invisible
        (a lambda body after variable substitution) refuses; one that
        never rendered at all (analyzer-internal replacement subtrees,
        e.g. str_to_map's struct(k, v) lowering) is ignored."""
        if not self._struct_drop_candidates:
            return txt
        try:
            raw = e.sql()
        except Exception:  # noqa: BLE001 - render errors surface later
            raw = txt
        for nsql, names in self._struct_drop_candidates:
            if self._find_outside_str(txt, nsql, 0) >= 0:
                vals = self._split_top_args(nsql[len("struct("):-1])
                if len(vals) != len(names) or any(
                        "'" in nm or "\\" in nm for nm in names):
                    raise DialectError(
                        "struct() field name is dropped by "
                        f"Expression.sql and not repairable: {nsql[:90]}")
                pairs = ", ".join(
                    f"'{nm}', {v}" for nm, v in zip(names, vals))
                while True:
                    at = self._find_outside_str(txt, nsql, 0)
                    if at < 0:
                        break
                    txt = (txt[:at] + f"named_struct({pairs})"
                           + txt[at + len(nsql):])
            elif self._find_outside_str(raw, nsql, 0) >= 0:
                # Rendered in e.sql() but invisible in the lambda-
                # rendered text.  Unlike the cast-drop class this is
                # NOT deferred to the validator even though it would
                # catch real drift (r11 audit: every such entry fails
                # validation anyway — downstream references use the
                # declared name) — refusing HERE keeps the precise
                # refusal reason for the sweep's class histogram.
                raise DialectError(
                    "struct() field name is dropped by Expression.sql "
                    "inside a lambda body — the re-parse renames "
                    f"{names!r}: {nsql[:90]}")
        return txt

    def _fix_cast_drops(self, txt: str, raw: str | None = None) -> str:
        """Complex-type CAST repair (the FIFTH silent-arg-drop class,
        r9 find, repaired r10): Catalyst renders CAST(x AS ARRAY<T>) as
        just x's render, so the target type vanishes and the re-parse
        computes different element types.  _check_tree records the
        lossy render + the tree's target type; each candidate whose
        render occurs EXACTLY ONCE in the text is wrapped back into an
        explicit CAST at that anchor.  A second occurrence is ambiguous
        (the same spelling may be the UN-cast child elsewhere) —
        refuse.  A candidate that never rendered (analyzer replacement
        subtrees) is ignored.  Nested dropped casts resolve correctly
        because _check_tree records parent-before-child and each wrap
        keeps the child's anchor inside the new CAST.  Safety net: the
        Spark-dialect validator compares the full round-trip schema
        including nested types, so a mis-anchored wrap refuses rather
        than drifting silently."""
        if not self._cast_drop_candidates:
            return txt
        for nsql, dt in self._cast_drop_candidates:
            at = self._find_outside_str(txt, nsql, 0)
            if at < 0:
                # r10 ADVICE: the lambda render path renames lambda
                # variables, so a candidate whose child CONTAINS a
                # lambda spells differently in the emitted text WITHOUT
                # being an analyzer replacement subtree — distinguished
                # by the RAW e.sql() render (the same adjudication
                # _fix_struct_drops uses).  Present-in-raw drops are
                # usually analyzer-INSERTED coercion casts that
                # re-analysis re-derives identically (sweep: all three
                # such registry entries round-trip schema- and
                # value-exact), so under the Spark-dialect validator
                # they pass through to the full nested-type check —
                # but when validation is OFF nothing would catch a real
                # drift, so refuse there (the old code silently
                # continued: wrong element types with validate=False).
                if raw is not None and not self._validated and \
                        self._find_outside_str(raw, nsql, 0) >= 0:
                    raise DialectError(
                        "complex-type CAST target is dropped by "
                        "Expression.sql inside a lambda-rendered "
                        f"expression — not anchorable: {nsql[:90]}")
                continue  # replacement subtree: render never surfaced
            if self._find_outside_str(txt, nsql, at + 1) >= 0:
                raise DialectError(
                    "complex-type CAST target is dropped by "
                    "Expression.sql and its render is not uniquely "
                    f"anchorable: {nsql[:90]}")
            txt = (txt[:at] + f"CAST({nsql} AS {dt})"
                   + txt[at + len(nsql):])
        return txt

    def _fix_schema_fn_drops(self, txt: str) -> str:
        """Re-attach the schema (and options) argument that
        from_csv/from_json's Expression.sql drops (the SEVENTH
        silent-arg-drop class, r11): each candidate whose lossy render
        occurs EXACTLY ONCE is rewritten to
        ``fn(input, 'DDL'[, map('k', 'v', ...)])``.  Ambiguous
        multi-occurrence anchors refuse; a candidate that never
        rendered refuses too — unlike the cast class this drop is
        NEVER benign (the emitted text is an arity error), so there is
        no analyzer-replacement case to ignore."""
        for render, rebuilt in self._duckdb_render_repairs:
            at = self._find_outside_str(txt, render, 0)
            if at < 0 or \
                    self._find_outside_str(txt, render, at + 1) >= 0:
                raise DialectError(
                    "tree-informed DuckDB repair render is not uniquely "
                    f"anchorable: {render[:90]}")
            txt = txt[:at] + rebuilt + txt[at + len(render):]
        if not self._schema_fn_drop_candidates:
            return txt
        for nsql, ddl, opts in self._schema_fn_drop_candidates:
            at = self._find_outside_str(txt, nsql, 0)
            if at < 0 or self._find_outside_str(txt, nsql, at + 1) >= 0:
                raise DialectError(
                    "from_csv/from_json/to_json schema or options "
                    "argument is dropped by Expression.sql and its "
                    f"render is not uniquely anchorable: {nsql[:90]}")
            extra = f", '{ddl}'" if ddl is not None else ""
            if opts:
                pairs = ", ".join(f"'{k}', '{v}'" for k, v in opts)
                extra += f", map({pairs})"
            rebuilt = nsql[:-1] + extra + ")"
            txt = txt[:at] + rebuilt + txt[at + len(nsql):]
        return txt

    @staticmethod
    def _scala_map_items(jmap) -> list[tuple[str, str]]:
        items = []
        it = jmap.iterator()
        while it.hasNext():
            kv = it.next()
            items.append((kv._1(), kv._2()))
        return items

    def _sqls(self, jexprs) -> list[str]:
        return [self._expr_sql(e) for e in self._seq(jexprs)]

    def _qual_alias(self, node) -> str | None:
        """The single-part qualifier shared by every qualified output
        attribute of ``node``, if any.  Catalyst renders attribute
        references WITH their original qualifier (``large.v2`` after
        ``df.alias("large")``); a derived table must carry that name or
        the reference dangles — naming the factor by the common
        qualifier keeps Expression.sql's rendering resolvable
        (reference plan.rs derive_table_with_alias keeps the original
        table alias the same way)."""
        if node is None:
            return None
        quals: set[str] = set()
        out = node.output()
        for i in range(out.size()):
            q = out.apply(i).qualifier()
            if q.size() > 1:
                return None  # catalog-qualified: no single alias matches
            if q.size() == 1:
                quals.add(q.apply(0))
        if len(quals) != 1:
            return None
        name = next(iter(quals))
        return name if "`" not in name else None

    def _hide_and_alias(self, node) -> str:
        """The factor alias for a derived table exposing ``node``'s
        output; when the alias is GENERATED the node's output
        qualifiers become hidden pairs (see _hide_quals)."""
        qual = self._qual_alias(node)
        q = self.dialect.identifier_quote
        if qual is None or q in qual:
            self._hide_quals(node)
            return self._alias()
        return f"{q}{qual}{q}"

    def _hide_quals(self, node) -> None:
        """A derived table just got a GENERATED alias: the qualifiers of
        ``node``'s output attributes are now invisible to every ancestor
        block, but Catalyst's Expression.sql still renders references to
        those attributes QUALIFIED (`customer`.`c_name`) — which dangles
        against the tN factor (the r9 sweep's biggest refusal class:
        mixed-qualifier join/aggregate outputs).  Record each
        (qual, name) pair whose bare name is UNIQUE within the node's
        output; _expr_sql rewrites those references to the bare name.
        Safety: wherever the stripped bare name resolves at all, it
        resolves either to the hidden node's column (ancestor blocks) or
        to the unique same-named column of a live factor that the
        qualified form also named; in every conflicting case (two
        factors exposing the name) re-analysis fails LOUDLY with
        AMBIGUOUS_REFERENCE and the unparse refuses — a silent
        re-resolution is impossible."""
        if node is None:
            return
        out = node.output()
        names: dict[str, int] = {}
        pairs: list[tuple[str, str]] = []
        for i in range(out.size()):
            a = out.apply(i)
            names[a.name()] = names.get(a.name(), 0) + 1
            qv = a.qualifier()
            if qv.size() == 1:
                pairs.append((qv.apply(0), a.name()))
        for qual, name in pairs:
            if names[name] != 1 or "`" in qual or "`" in name:
                continue
            self._hidden_pairs.add((qual, name))

    def _strip_hidden_quals(self, txt: str) -> str:
        """Rewrite qual.name → name for qualifiers hidden behind
        generated derived aliases.  Catalyst's Expression.sql quotes
        identifiers only when they need it, so both the plain and the
        dialect-quoted spelling of each part must match; a longer dotted
        chain (catalog.qual.name) is protected by the lookbehind.  Runs
        only over outside-literal segments; the replacement is emitted
        quoted, which is valid in every dialect."""
        if not self._hidden_pairs:
            return txt
        import re as _re

        q = self.dialect.identifier_quote
        qq = _re.escape(q)

        def seg(s: str) -> str:
            for qual, name in self._hidden_pairs:
                qual_pat = (f"(?:{qq}{_re.escape(qual)}{qq}"
                            f"|{_re.escape(qual)})")
                name_pat = (f"(?:{qq}{_re.escape(name)}{qq}"
                            f"|{_re.escape(name)}\\b)")
                s = _re.sub(
                    rf"(?<![\w.{qq}]){qual_pat}\.{name_pat}",
                    f"{q}{name}{q}", s)
            return s

        return "".join(
            s if is_lit else seg(s)
            for is_lit, s in self._literal_segments(txt))

    def _derive(self, b: _Block, node=None) -> _Block:
        """Flush a block into a derived table (plan.rs derive_table).
        ``node`` (the plan whose output the new block exposes) supplies
        the factor alias when its attributes render qualified."""
        alias = self._hide_and_alias(node)
        return _Block(from_=f"({b.render()}) AS {alias}")

    def _as_factor(self, b: _Block, node=None) -> str:
        """A join input: bare table factor if untouched, else derived.
        A factor that is itself a JOIN chain is parenthesized — without
        the parens a RIGHT-nested join tree renders ``A JOIN B JOIN C
        ON bc ON abc`` and the doubled ON clauses fail to parse
        (registry-sweep find on the 8-relation TPC-H q2 shape)."""
        if (b.from_ is not None and b.select is None and not b.where
                and not b.distinct and b.group_by is None
                and b.order_by is None and b.limit is None
                and b.offset is None):
            if _top_level_join(b.from_):
                return f"({b.from_})"
            return b.from_
        alias = self._hide_and_alias(node)
        return f"({b.render()}) AS {alias}"

    def _using_columns(self, node, cond) -> list[str] | None:
        """If the join condition is a conjunction of EqualTo over
        SAME-NAMED attribute pairs, one side each from left/right (the
        df.join(other, "key") shape), return the quoted key list for a
        USING clause; else None."""
        left_ids = {a.exprId().id()
                    for a in self._seq(node.left().output())}
        right_ids = {a.exprId().id()
                     for a in self._seq(node.right().output())}
        cols: list[str] = []
        stack = [cond]
        while stack:
            c = stack.pop()
            ccls = c.getClass().getSimpleName()
            if ccls == "And":
                stack.extend((c.left(), c.right()))
                continue
            if ccls != "EqualTo":
                return None
            a, b = c.left(), c.right()
            if (a.getClass().getSimpleName() != "AttributeReference"
                    or b.getClass().getSimpleName() != "AttributeReference"):
                return None
            if a.name() != b.name():
                return None
            ids = {a.exprId().id(), b.exprId().id()}
            if not (ids & left_ids and ids & right_ids):
                return None
            cols.append(a.name())
        if len(set(cols)) != len(cols) or not cols:
            return None
        q = self.dialect.identifier_quote
        if any(q in c or "`" in c for c in cols):
            return None
        return [f"{q}{c}{q}" for c in cols]

    def _grouping_sets(self, agg, ex) -> _Block:
        """Reconstruct GROUP BY GROUPING SETS from Aggregate(Expand).

        The analyzer lowers ROLLUP/CUBE/GROUPING SETS into an Expand whose
        projections replicate each input row once per grouping set, with
        the inactive grouping columns nulled and a spark_grouping_id
        literal appended; the Aggregate then groups by the replicated
        columns + the id.  Supported shape: plain-COLUMN grouping
        expressions (the Expand child's duplicated tail is bare
        AttributeReferences) and no grouping()/grouping_id() in the
        output (their rendering references the internal
        spark_grouping_id attribute, which has no re-parsable spelling).
        """
        out = ex.output()
        n_out = out.size()
        if (n_out == 0
                or out.apply(n_out - 1).name() != "spark_grouping_id"):
            raise DialectError(
                "Expand is not the grouping-sets shape (no "
                "spark_grouping_id tail) — not unparsable")
        g = agg.groupingExpressions()
        k = g.size() - 1
        base = n_out - 1 - k
        if k < 0 or base < 0:
            raise DialectError("grouping-sets Expand with no group columns")
        for i in range(k):
            gi = g.apply(i)
            if (gi.getClass().getSimpleName() != "AttributeReference"
                    or gi.exprId().id() != out.apply(base + i).exprId().id()):
                raise DialectError(
                    "grouping expression is not the Expand's replicated "
                    "column — not unparsable")
        proj_child = ex.child()
        if proj_child.getClass().getSimpleName() != "Project":
            raise DialectError(
                "grouping-sets Expand over a non-Project child")
        pl = proj_child.projectList()
        n_pl = pl.size()
        spell = []
        for i in range(k):
            e = pl.apply(n_pl - k + i)
            if e.getClass().getSimpleName() == "Alias":
                e = e.child()  # the analyzer aliases the replicated copy
            if e.getClass().getSimpleName() != "AttributeReference":
                # computed grouping expr: the replicated attr's NAME is
                # the expression text (e.g. `year(o_orderdate)`), which
                # does not re-resolve against the raw child — refuse.
                raise DialectError(
                    "computed grouping-set expression has no re-parsable "
                    f"column spelling: {e.toString()[:80]}")
            spell.append(self._expr_sql(e))
        sets = []
        projs = ex.projections()
        for p in range(projs.size()):
            row = projs.apply(p)
            active = []
            for i in range(k):
                cell = row.apply(base + i)
                is_null = (cell.getClass().getSimpleName() == "Literal"
                           and cell.value() is None)
                if not is_null:
                    active.append(spell[i])
            sets.append("(" + ", ".join(active) + ")")
        import re as _re

        def _regroup(txt: str) -> str:
            # grouping(col) lowers to CAST((shiftright(spark_grouping_id,
            # N) & 1) AS TINYINT) with bit N counting from the LAST
            # grouping column; grouping_id() resolves to the raw internal
            # attribute.  Both lowerings are exact — rewrite them back to
            # the calls so the text re-parses (the re-analysis re-lowers
            # to the identical expressions; sweep row-compares confirm).
            # Substitutions run on the OUTSIDE-LITERAL segments only: a
            # string literal containing 'spark_grouping_id' must survive
            # verbatim (r9 advice find).
            def bit(m):
                n = int(m.group(1))
                if n >= k:
                    return m.group(0)
                return f"grouping({spell[k - 1 - n]})"

            def outside(seg: str) -> str:
                seg = _re.sub(
                    r"CAST\(\(shiftright\(spark_grouping_id, (\d+)\) & 1L?\)"
                    r" AS TINYINT\)", bit, seg)
                # explicit args (they must match the grouping columns in
                # order, which `spell` is): Spark re-lowers identically,
                # and DuckDB's grouping_id() requires them
                return _re.sub(r"\bspark_grouping_id\b",
                               f"grouping_id({', '.join(spell)})", seg)

            return "".join(
                s if is_lit else outside(s)
                for is_lit, s in self._literal_segments(txt))

        sel = []
        for e in self._seq(agg.aggregateExpressions()):
            txt = _regroup(self._expr_sql(e))
            if "spark_grouping_id" in self._outside_literals(txt):
                raise DialectError(
                    "grouping()/grouping_id() lowering did not match the "
                    "known pattern — not unparsable")
            sel.append(txt)
        b = self.visit(proj_child.child())
        if (b.select is not None or b.group_by is not None
                or b.distinct or b.order_by is not None
                or b.limit is not None or b.offset is not None):
            b = self._derive(b, proj_child.child())
        b.select = sel
        b.group_by = [f"GROUPING SETS ({', '.join(sets)})"]
        if self.dialect.name == "duckdb" and "()" in sets:
            # Empty-input parity (sweep divergence on tpcds_q80, whose
            # sf0.001 date window filters every fact row): Spark lowers
            # grouping sets to Expand + a grouped Aggregate keyed on
            # spark_grouping_id, so an EMPTY input yields 0 rows for
            # every set including (); DuckDB follows the standard where
            # the () set is a global aggregate and emits its 1 all-NULL
            # grand-total row.  count(*) ≥ 1 for every group an engine
            # actually materializes from rows, so this HAVING drops
            # exactly the empty-input () row and nothing else.  Spark
            # dialect keeps its native semantics — no guard.
            b.having = "count(*) > 0"
        return b

    # -- relations ---------------------------------------------------------
    def _relation(self, node) -> _Block:
        rel = node.relation()
        rcls = rel.getClass().getSimpleName()
        if "HadoopFsRelation" not in rcls:
            raise DialectError(f"unsupported relation: {rcls}")
        fmt = rel.fileFormat().toString().lower()
        paths = rel.location().rootPaths()
        roots = [paths.apply(i).toString() for i in range(paths.size())]
        factors = [self._file_factor(fmt, r) for r in roots]
        if len(factors) == 1:
            return _Block(from_=factors[0])
        # A multi-root listing (spark.read.parquet(a, b)) is the UNION ALL
        # of the per-root scans — identical rows, one extra scan node
        # (reference ListingTable with several location URLs).  Each
        # branch selects the relation's own output columns BY NAME, so a
        # root whose footer schema lacks one (mergeSchema evolution reads)
        # fails re-analysis loudly instead of silently resolving a
        # different column set per root.
        q = self.dialect.identifier_quote
        names = [node.output().apply(i).name()
                 for i in range(node.output().size())]
        if any(q in n or "`" in n for n in names):
            raise DialectError("multi-root column name not quotable")
        sel = ", ".join(f"{q}{n}{q}" for n in names)
        branches = " UNION ALL ".join(
            f"SELECT {sel} FROM {f}" for f in factors)
        return _Block(from_=f"({branches}) AS {self._alias()}")

    def _file_factor(self, fmt: str, path: str) -> str:
        if path.startswith("file:"):
            path = path[len("file:"):]
        style = self.dialect.file_table_style
        if fmt not in ("parquet", "orc"):
            # Direct-file table factors carry NO reader options or user
            # schema; only self-describing columnar formats survive the
            # round trip (a csv.`path` re-read loses the schema/header/
            # sep options and resolves different columns — found by the
            # registry sweep as a reparse failure).
            raise DialectError(
                f"{fmt} file relation loses reader options in a direct "
                "file factor — not unparsable")
        if style == "spark":
            return f"{fmt}.`{path}`"
        if style == "duckdb":
            if fmt != "parquet":
                raise DialectError(
                    f"duckdb file factor only for parquet, got {fmt}")
            # single .parquet file → read directly; DIRECTORY (Spark
            # write targets are directories of part files even when the
            # name ends in .parquet) → recursive glob (exec-pass find:
            # derived-layout scans matched zero files)
            glob = (f"{path}/**/*.parquet" if os.path.isdir(path)
                    else path)
            # Always alias file factors: DuckDB names an unaliased factor
            # after the FUNCTION ("read_parquet"), so a join of two bare
            # scans binder-errors with "Duplicate alias" (r9 judge repro).
            return f"read_parquet('{glob}') AS {self._alias()}"
        raise DialectError(
            f"dialect {self.dialect.name} has no syntax for file relations")

    # -- plan walk ---------------------------------------------------------
    def visit(self, node) -> _Block:
        cls = node.getClass().getSimpleName()
        if cls == "LogicalRelation":
            return self._relation(node)
        if cls == "OneRowRelation":
            # FROM-less SELECT (Project over the implicit one-row input)
            return _Block(from_=None)
        if cls == "LocalRelation":
            # Inline data (spark.sql VALUES / resolved inline tables):
            # re-render as a VALUES table factor, each cell through
            # Catalyst Literal.sql so typed literals keep their type
            # (DATE '...', 1.50BD, CAST(NULL AS INT)).  Reference
            # unparser renders LogicalPlan::Values the same way.
            out, data = node.output(), node.data()
            q = self.dialect.identifier_quote
            names = [out.apply(i).name() for i in range(out.size())]
            if any(q in n or "`" in n for n in names):
                raise DialectError("inline-table column name not quotable")
            cols = ", ".join(f"{q}{n}{q}" for n in names)
            alias = self._alias()
            if data.size() == 0:
                # VALUES needs >= 1 row; an empty inline relation is a
                # typed empty table — a FROM-less select under WHERE false
                sel = ", ".join(
                    f"CAST(NULL AS {out.apply(i).dataType().sql()}) "
                    f"AS {q}{names[i]}{q}"
                    for i in range(out.size()))
                return _Block(
                    from_=f"(SELECT {sel} WHERE false) AS {alias}")
            if data.size() > 100:
                raise DialectError(
                    f"inline relation with {data.size()} rows — VALUES "
                    "rendering capped at 100 (ship data as a table, "
                    "not SQL text)")
            try:
                from pyspark import SparkContext

                jvm = SparkContext._active_spark_context._jvm
                lit_f = jvm.org.apache.spark.sql.catalyst.expressions.Literal
            except Exception as e:  # noqa: BLE001 - no active JVM handle
                raise DialectError(f"no JVM handle for literal rendering: {e}")
            rows = []
            for r in range(data.size()):
                row = data.apply(r)
                cells = []
                for i in range(out.size()):
                    dt = out.apply(i).dataType()
                    v = row.get(i, dt)
                    ss = dt.simpleString()
                    # py4j converts primitive-backed cells to python
                    # int/float and would send them back boxed to the
                    # WRONG width (Long→Integer, Float→Double, Byte→
                    # Integer — the Literal factory rejects each) — render
                    # those literals as text instead of round-tripping
                    # them through the factory.
                    is_num = (isinstance(v, (int, float))
                              and not isinstance(v, bool))
                    if is_num and ss == "bigint":
                        txt = f"CAST({v} AS BIGINT)"
                    elif is_num and ss == "timestamp_ntz":
                        import datetime as _dt

                        ts = (_dt.datetime(1970, 1, 1)
                              + _dt.timedelta(microseconds=v))
                        txt = ("TIMESTAMP_NTZ "
                               f"'{ts.strftime('%Y-%m-%d %H:%M:%S.%f')}'")
                    elif is_num and ss == "timestamp":
                        # LTZ cells store epoch-UTC micros, but Spark
                        # parses TIMESTAMP literals in the SESSION
                        # timezone — render the wall time in that zone,
                        # and refuse when the wall time doesn't round-trip
                        # to the same instant (DST gap/ambiguity) (r9
                        # advice find; correct-by-accident under the
                        # repo's UTC pin before).
                        import datetime as _dt

                        try:
                            from zoneinfo import ZoneInfo

                            tz = ZoneInfo(self.session_tz)
                        except Exception as exc:  # noqa: BLE001
                            raise DialectError(
                                "session timezone "
                                f"{self.session_tz!r} is not resolvable "
                                "— TIMESTAMP cell not unparsable") from exc
                        inst = (_dt.datetime(
                            1970, 1, 1, tzinfo=_dt.timezone.utc)
                            + _dt.timedelta(microseconds=v))
                        wall = inst.astimezone(tz).replace(tzinfo=None)
                        if wall.replace(tzinfo=None, fold=0).replace(
                                tzinfo=tz).astimezone(
                                _dt.timezone.utc) != inst:
                            raise DialectError(
                                "TIMESTAMP cell falls in a DST-ambiguous "
                                "wall time for session timezone "
                                f"{self.session_tz!r} — not unparsable")
                        txt = ("TIMESTAMP "
                               f"'{wall.strftime('%Y-%m-%d %H:%M:%S.%f')}'")
                    elif is_num and ss in ("tinyint", "smallint"):
                        txt = f"CAST({v} AS {ss.upper()})"
                    elif is_num and ss == "float":
                        if v != v:
                            txt = "CAST('NaN' AS FLOAT)"
                        elif v in (float("inf"), float("-inf")):
                            txt = f"CAST('{v}' AS FLOAT)"
                        else:
                            txt = f"CAST({v!r} AS FLOAT)"
                    else:
                        txt = lit_f.create(v, dt).sql()
                    cells.append(_requote(txt, q))
                rows.append("(" + ", ".join(cells) + ")")
            return _Block(
                from_=f"(VALUES {', '.join(rows)}) AS {alias}({cols})")
        if cls == "ResolvedHint":
            # Strategy hints (broadcast/merge/shuffle_hash) are COST-ONLY
            # physical directives: SQL text renders logical structure, so
            # the hint is dropped, same as the reference unparser (plan.rs
            # renders LogicalPlan structure; exec hints have no Expr/plan
            # spelling).  Rows are identical by construction.
            return self.visit(node.child())
        if cls in ("Repartition", "RepartitionByExpression"):
            # df.repartition()/coalesce()/repartitionByRange: partitioning
            # directives, cost-only — values unchanged.  (sortWithinParts
            # is NOT in this class: it changes observable row order and
            # still refuses below.)
            return self.visit(node.child())
        if cls == "CollectMetrics":
            # df.observe(): an identity over the rows that accumulates
            # side-channel metrics — no SQL spelling, rows unchanged;
            # unwrap like the other cost-only/observability directives.
            return self.visit(node.child())
        if cls == "WithCTE":
            q = self.dialect.identifier_quote
            parts, used = [], set()
            for d in self._seq(node.cteDefs()):
                child = d.child()
                if child.getClass().getSimpleName() == "SubqueryAlias":
                    name = child.identifier().name()
                    body = child.child()
                else:
                    name, body = f"cte{d.id()}", child
                if name in used:
                    raise DialectError(
                        f"duplicate CTE name {name!r} (shadowing) has no "
                        "single-WITH rendering")
                used.add(name)
                self._cte_names[d.id()] = name
                parts.append(f"{q}{name}{q} AS ({self.visit(body).render()})")
            body_sql = self.visit(node.plan()).render()
            text = "WITH " + ", ".join(parts) + " " + body_sql
            return _Block(from_=f"({text}) AS {self._alias()}")
        if cls == "CTERelationRef":
            name = self._cte_names.get(node.cteId())
            if name is None:
                raise DialectError(
                    "CTE reference outside its defining WITH scope")
            q = self.dialect.identifier_quote
            return _Block(from_=f"{q}{name}{q}")
        if cls == "Generate":
            # explode/posexplode/inline/stack/json_tuple → LATERAL VIEW
            # (Spark syntax).  DuckDB (r11): single-column array
            # explode — the dominant shape, and the largest exec-
            # refusal class at 129 entries — translates to a lateral
            # unnest join with EXACT row semantics (probed: NULL and
            # empty arrays drop the row under CROSS JOIN unnest and
            # null-emit under LEFT JOIN ... ON true, matching Spark's
            # inner and OUTER LATERAL VIEW respectively).  Multi-column
            # generators (posexplode/map-explode/inline/stack) refuse.
            if node.unrequiredChildIndex().size() != 0:
                raise DialectError(
                    "Generate with pruned child output is optimizer-"
                    "internal — not unparsable")
            gen = node.generator()
            q = self.dialect.identifier_quote
            out_cols = [f"{q}{a.name()}{q}"
                        for a in self._seq(node.generatorOutput())]
            qual = node.qualifier()
            alias = qual.get() if qual.isDefined() else self._alias()
            if self.dialect.name == "duckdb":
                # r12: beyond single-column array explode, the multi-
                # column generators translate too — each probed exact:
                #   posexplode(arr)  → LATERAL (SELECT CAST(unnest(
                #       generate_series(1, len(a))) - 1 AS INT) AS pos,
                #       unnest(a) AS col) — the two parallel unnests ZIP
                #       (probed), 0-based pos, inner drops NULL/empty
                #       under CROSS JOIN LATERAL, outer null-emits under
                #       LEFT JOIN LATERAL ... ON true (WITH ORDINALITY
                #       is unimplemented in DuckDB 1.0);
                #   explode(map)    → unnest(map_entries(m)) AS t(e) +
                #       e.key/e.value projected (entry order preserved
                #       by both engines);
                #   inline(arr<struct>) → unnest(a) AS t(u) + u.f
                #       field-access projections, positionally paired
                #       with the declared output names (DuckDB's
                #       AS t(a, b) multi-name form SILENTLY binds only
                #       the first name to the whole struct — probed —
                #       so field unpacking must be explicit).
                # stack()/json_tuple() refuse (no DuckDB analog).
                gcls = gen.getClass().getSimpleName()
                b = self.visit(node.child())
                if (b.select is not None or b.distinct
                        or b.group_by is not None
                        or b.order_by is not None
                        or b.limit is not None or b.offset is not None):
                    b = self._derive(b, node.child())
                one_row = b.from_ is None
                if one_row:
                    b = _Block(from_=f"(SELECT 1 AS {q}__one__{q}) "
                                     f"AS {self._alias()}")
                join = ("LEFT JOIN" if node.outer() else "CROSS JOIN")
                on = " ON true" if node.outer() else ""
                if gcls == "Explode" and len(out_cols) == 1:
                    arr_sql = self._expr_sql(gen.child())
                    b.from_ += (f" {join} unnest({arr_sql}) "
                                f"AS {q}{alias}{q}({out_cols[0]}){on}")
                    if one_row:
                        b.select = out_cols
                    return b
                if gcls == "PosExplode" and len(out_cols) == 2:
                    # array posexplode only (a map's 3-column variant
                    # falls through to the refusal below)
                    arr_sql = self._expr_sql(gen.child())
                    lat = (f"LATERAL (SELECT CAST(unnest(generate_series"
                           f"(1, len({arr_sql}))) - 1 AS INT) AS "
                           f"{out_cols[0]}, unnest({arr_sql}) AS "
                           f"{out_cols[1]}) AS {q}{alias}{q}")
                    b.from_ += f" {join} {lat}{on}"
                    if one_row:
                        b.select = out_cols
                    return b
                if gcls in ("Explode", "Inline") and (
                        gcls == "Inline" or len(out_cols) == 2):
                    # map explode (key, value) / struct-array inline:
                    # unnest to a fresh struct column, then project the
                    # child columns plus explicit field accesses — the
                    # select flushes to a derived table downstream, so
                    # upstream references resolve by bare name.
                    try:
                        ct = gen.child().dataType()
                        ctsql = ct.sql().upper()
                    except Exception as e:  # noqa: BLE001
                        raise DialectError(
                            f"generator input type unreadable: {e}")
                    arr_sql = self._expr_sql(gen.child())
                    u = self._alias()
                    if gcls == "Explode":
                        if not ctsql.startswith("MAP"):
                            raise DialectError(
                                "2-column explode over a non-map input "
                                "— not unparsable in this dialect")
                        factor = (f"unnest(map_entries({arr_sql})) "
                                  f"AS {q}{alias}{q}({q}{u}{q})")
                        fields = ["key", "value"]
                    else:
                        try:
                            et = ct.elementType()
                            flds = et.fields()
                            try:  # Scala Seq vs py4j-converted array
                                fields = [f.name() for f
                                          in self._seq(flds)]
                            except Exception:  # noqa: BLE001
                                fields = [f.name() for f in flds]
                        except Exception as e:  # noqa: BLE001
                            raise DialectError(
                                f"inline() element type unreadable: {e}")
                        if len(fields) != len(out_cols):
                            raise DialectError(
                                "inline() output arity does not match "
                                "the element struct — not unparsable")
                        if any(q in f or "`" in f for f in fields):
                            raise DialectError(
                                "inline() struct field not quotable")
                        factor = (f"unnest({arr_sql}) "
                                  f"AS {q}{alias}{q}({q}{u}{q})")
                    child_cols = [a.name() for a
                                  in self._seq(node.child().output())]
                    gen_names = [c.strip(q) for c in out_cols]
                    if (len(set(child_cols + gen_names))
                            != len(child_cols) + len(gen_names)):
                        raise DialectError(
                            "generator output name collides with a "
                            "child column — bare-name projection is "
                            "ambiguous, not unparsable")
                    if any(q in c or "`" in c for c in child_cols):
                        raise DialectError(
                            "child column not quotable in this dialect")
                    b.from_ += f" {join} {factor}{on}"
                    sel = ([] if one_row
                           else [f"{q}{c}{q}" for c in child_cols])
                    sel += [f"{q}{u}{q}.{q}{f}{q} AS {oc}"
                            for f, oc in zip(fields, out_cols)]
                    b.select = sel
                    return b
                raise DialectError(
                    "generator has no faithful DuckDB lateral-unnest "
                    f"spelling: {gcls}/{len(out_cols)} cols — not "
                    "unparsable")
            if self.dialect.name != "spark":
                raise DialectError(
                    f"dialect {self.dialect.name} has no LATERAL VIEW")
            b = self.visit(node.child())
            if (b.select is not None or b.distinct
                    or b.group_by is not None or b.order_by is not None
                    or b.limit is not None or b.offset is not None):
                b = self._derive(b, node.child())
            gen_sql = self._expr_sql(node.generator())
            outer = "OUTER " if node.outer() else ""
            one_row = b.from_ is None
            if one_row:
                # Generate directly over the one-row relation (SELECT
                # explode(...)): LATERAL VIEW needs a FROM factor, and a
                # bare * would drag the dummy column into the schema —
                # select exactly the generator output.
                b = _Block(
                    from_=f"(SELECT 1 AS {q}__one__{q}) AS {self._alias()}")
            b.from_ += (f" LATERAL VIEW {outer}{gen_sql} "
                        f"{q}{alias}{q} AS {', '.join(out_cols)}")
            if one_row:
                b.select = out_cols
            return b
        if cls == "SubqueryAlias":
            q = self.dialect.identifier_quote
            ident = node.identifier()
            qualifier = self._seq(ident.qualifier())
            if qualifier:
                # A catalog table (saveAsTable / metastore): column refs
                # render FULLY QUALIFIED (catalog.db.table.col), so the
                # only resolvable FROM factor is the qualified table name
                # itself — legitimate only when the subtree is the plain
                # table scan (View/Project-of-attributes/Relation).
                if self.dialect.name != "spark":
                    raise DialectError(
                        "catalog-qualified table reference is Spark-only")
                n = node.child()
                while n.getClass().getSimpleName() in ("View", "Project"):
                    n = n.child()
                if n.getClass().getSimpleName() != "LogicalRelation":
                    raise DialectError(
                        "qualified alias over a non-scan subtree")
                parts = qualifier + [ident.name()]
                return _Block(from_=".".join(f"{q}{p}{q}" for p in parts))
            child = self.visit(node.child())
            return _Block(from_=f"({child.render()}) AS {q}{ident.name()}{q}")
        if cls == "View":
            return self.visit(node.child())
        if cls == "Project":
            b = self.visit(node.child())
            # distinct flush: SELECT DISTINCT <proj> would NARROW the
            # dedup to the projected columns — project does not commute
            # with a whole-row Deduplicate (r8 review find).
            if (b.select is not None or b.distinct
                    or b.order_by is not None or b.limit is not None):
                b = self._derive(b, node.child())
            b.select = self._sqls(node.projectList())
            return b
        if cls == "Filter":
            b = self.visit(node.child())
            # distinct/offset flush: in SQL, WHERE runs BEFORE both
            # DISTINCT and OFFSET — a filter applied AFTER either must
            # not merge into the same block (offset: r8 review find;
            # distinct: only commutes for deterministic predicates, and
            # a derived table is always correct).
            if (b.select is not None or b.group_by is not None
                    or b.distinct or b.order_by is not None
                    or b.limit is not None or b.offset is not None):
                b = self._derive(b, node.child())
            b.where.append(self._expr_sql(node.condition()))
            return b
        if cls == "Aggregate" and \
                node.child().getClass().getSimpleName() == "Expand":
            # GROUP BY ROLLUP/CUBE/GROUPING SETS analyzes to
            # Aggregate(Expand(Project(child))) — reconstruct the
            # GROUPING SETS clause from the Expand projections (the
            # reference unparser rebuilds LogicalPlan::Aggregate grouping
            # sets the same way in plan.rs).
            return self._grouping_sets(node, node.child())
        if cls == "Aggregate":
            b = self.visit(node.child())
            # distinct flush: GROUP BY in the same block would aggregate
            # the PRE-dedup rows (SELECT DISTINCT applies after
            # aggregation in SQL) — r8 review find.  order_by/offset:
            # both run after grouping in SQL, so an aggregate applied
            # after them must derive.
            if (b.select is not None or b.group_by is not None
                    or b.distinct or b.order_by is not None
                    or b.limit is not None or b.offset is not None):
                b = self._derive(b, node.child())
            b.select = self._sqls(node.aggregateExpressions())
            groups = self._sqls(node.groupingExpressions())
            b.group_by = groups or None  # global agg: plain SELECT aggs
            return b
        if cls == "Sort":
            if not getattr(node, "global")():
                raise DialectError("sortWithinPartitions has no SQL equivalent")
            b = self.visit(node.child())
            if b.limit is not None or b.offset is not None:
                b = self._derive(b, node.child())
            b.order_by = self._sqls(node.order())
            return b
        if cls in ("GlobalLimit", "LocalLimit"):
            b = self.visit(node.child())
            if b.limit is not None and cls == "GlobalLimit":
                # GlobalLimit(LocalLimit(n)) pairs carry the same literal
                return b
            if b.limit is not None:
                b = self._derive(b, node.child())
            b.limit = node.limitExpr().sql()
            return b
        if cls == "Deduplicate":
            # df.distinct() analyzes to Deduplicate over all columns —
            # SELECT DISTINCT.  dropDuplicates(subset) keeps an arbitrary
            # row per key and has NO deterministic SQL equivalent: refuse.
            keys = {a.name() for a in self._seq(node.keys())}
            cols = {a.name() for a in self._seq(node.child().output())}
            if keys != cols:
                raise DialectError(
                    "dropDuplicates on a column subset is not SQL-expressible")
            b = self.visit(node.child())
            # offset flush: DISTINCT runs before OFFSET in a SQL block, so
            # a dedup applied after offset must derive (r8 review class).
            if (b.distinct or b.order_by is not None
                    or b.limit is not None or b.offset is not None):
                b = self._derive(b, node.child())
            b.distinct = True
            return b
        if cls == "Distinct":
            b = self.visit(node.child())
            if (b.distinct or b.order_by is not None
                    or b.limit is not None or b.offset is not None):
                b = self._derive(b, node.child())
            b.distinct = True
            return b
        if cls == "Offset":
            b = self.visit(node.child())
            # limit flush: df.limit(n).offset(m) takes n rows THEN skips m;
            # `LIMIT n OFFSET m` in one block skips m then takes n — the
            # clauses don't commute, so an offset arriving onto a block
            # that already has LIMIT must derive (r8 review find; the
            # reverse order, offset-then-limit, merges correctly).
            if b.offset is not None or b.limit is not None:
                b = self._derive(b, node.child())
            b.offset = node.offsetExpr().sql()
            return b
        if cls in ("Intersect", "Except"):
            kw = "INTERSECT" if cls == "Intersect" else "EXCEPT"
            kw += " ALL" if node.isAll() else ""
            lb, rb = self.visit(node.left()), self.visit(node.right())
            self._hide_quals(node)
            lhs, rhs = _render_schema_exact(lb), _render_schema_exact(rb)
            return _Block(from_=f"({lhs} {kw} {rhs}) AS {self._alias()}")
        if cls == "Range":
            # spark.range(start, end, step) -> the range() table function
            start, end = node.start(), node.end()
            step = node.step()
            if self.dialect.name == "duckdb":
                return _Block(from_=f"range({start}, {end}, {step}) AS "
                                    f"{self._alias()}(id)")
            return _Block(from_=f"range({start}, {end}, {step})")
        if cls == "Union":
            kids = self._seq(node.children())
            blocks = [self.visit(k) for k in kids]
            self._hide_quals(node)
            rendered = [_render_schema_exact(kb) for kb in blocks]
            body = " UNION ALL ".join(rendered)
            return _Block(from_=f"({body}) AS {self._alias()}")
        if cls == "Join":
            jt = node.joinType().sql().upper()
            if jt in ("LEFT SEMI", "LEFT ANTI"):
                if not self.dialect.supports_semi_anti_join:
                    raise DialectError(
                        f"dialect {self.dialect.name} lacks {jt} JOIN")
                if self.dialect.semi_anti_keyword == "duckdb":
                    # DuckDB (>= 0.8) spells these SEMI JOIN / ANTI JOIN
                    jt = jt.replace("LEFT ", "")
            lf = self._as_factor(self.visit(node.left()), node.left())
            rf = self._as_factor(self.visit(node.right()), node.right())
            cond = node.condition()
            if cond.isDefined():
                using = self._using_columns(node, cond.get())
                if using is not None and jt in ("INNER", "LEFT SEMI",
                                                "LEFT ANTI", "SEMI",
                                                "ANTI"):
                    # df.join(other, "k") equi-joins SAME-NAMED attributes
                    # from unqualified factors — an ON clause renders the
                    # key ambiguous (both factors expose `k`), USING
                    # resolves it and matches Catalyst's key-dedup output.
                    # INNER + SEMI/ANTI only: outer-join USING coalesces
                    # sides.  SEMI/ANTI (r11 — was the biggest
                    # AMBIGUOUS_REFERENCE refusal subclass): the right
                    # side never surfaces, so SELECT * == the LEFT schema
                    # exactly (verified: Spark resolves LEFT SEMI/ANTI
                    # USING and returns left columns unchanged) and
                    # same-named non-key columns cannot collide in the
                    # output — the INNER-only refusal below doesn't apply.
                    # Schema contract (r9 advice find): SELECT * over a
                    # USING join dedups/reorders the key, so a block that
                    # reaches the ROOT unprojected would emit a different
                    # schema than node.output().  Record the node's own
                    # output as using_out — to_sql materializes it if the
                    # block is still select-less at the root (bare names
                    # resolve against the merged key, whose value equals
                    # both sides under INNER).  Same-named NON-key columns
                    # on both sides make those names unresolvable — refuse
                    # (INNER only).
                    q = self.dialect.identifier_quote
                    keyset = {u.strip(q) for u in using}
                    lnames = [a.name()
                              for a in self._seq(node.left().output())]
                    rnames = [a.name()
                              for a in self._seq(node.right().output())]
                    dup_nonkey = (set(lnames) & set(rnames)) - keyset
                    if dup_nonkey and jt == "INNER":
                        raise DialectError(
                            "same-named non-key columns across a USING "
                            f"join ({sorted(dup_nonkey)[:3]}) are "
                            "ambiguous on re-parse — not unparsable")
                    out_names = [a.name()
                                 for a in self._seq(node.output())]
                    if any(q in n or "`" in n for n in out_names):
                        raise DialectError(
                            "USING-join output column name not quotable")
                    kw = "JOIN" if jt == "INNER" else f"{jt} JOIN"
                    b = _Block(
                        from_=f"{lf} {kw} {rf} USING ({', '.join(using)})")
                    b.using_out = [f"{q}{n}{q}" for n in out_names]
                    return b
                on = self._expr_sql(cond.get())
                return _Block(from_=f"{lf} {jt} JOIN {rf} ON {on}")
            if jt in ("INNER", "CROSS"):
                return _Block(from_=f"{lf} CROSS JOIN {rf}")
            raise DialectError(f"{jt} join without condition")
        if cls == "Window":
            b = self.visit(node.child())
            if (b.select is not None or b.distinct
                    or b.order_by is not None or b.limit is not None
                    or b.offset is not None):
                b = self._derive(b, node.child())
            q = self.dialect.identifier_quote
            child_cols = [f"{q}{a.name()}{q}"
                          for a in self._seq(node.child().output())]
            b.select = child_cols + self._sqls(node.windowExpressions())
            return b
        if cls == "LateralJoin":
            # df.lateralJoin / SQL JOIN LATERAL: the right side is a
            # LateralSubquery (plan + outerAttrs) — same interface as the
            # subquery expressions, so the correlated outer() unwrapping
            # in _subplan_sql applies unchanged.
            jt = node.joinType().sql().upper()
            if jt not in ("INNER", "LEFT OUTER", "CROSS"):
                raise DialectError(f"{jt} LATERAL join — not unparsable")
            lf = self._as_factor(self.visit(node.left()), node.left())
            inner = self._subplan_sql(node.right(), "LATERAL subquery")
            # name the lateral derived table by its plan's own output
            # qualifier (references render qualified); generated + hidden
            # otherwise — same contract as _derive
            alias = self._hide_and_alias(node.right().plan())
            kw = "LEFT OUTER JOIN" if jt == "LEFT OUTER" else "INNER JOIN"
            on = (self._expr_sql(node.condition().get())
                  if node.condition().isDefined() else "true")
            return _Block(
                from_=f"{lf} {kw} LATERAL ({inner}) AS {alias} ON {on}")
        if cls == "Expand":
            # Bare Expand (UNPIVOT / stack lowerings; the Aggregate-over-
            # Expand grouping-sets shape is reconstructed separately):
            # each projection row replicates the child with its own
            # expression list — exactly a UNION ALL of per-row SELECTs
            # over the same child factor.  Row-identical; the only
            # divergence is physical (N scans instead of one Expand),
            # which the unparse contract allows.
            q = self.dialect.identifier_quote
            out_names = [a.name() for a in self._seq(node.output())]
            if any(q in n or "`" in n for n in out_names):
                raise DialectError("Expand output column name not quotable")
            factor = self._as_factor(self.visit(node.child()), node.child())
            branches = []
            for row in self._seq(node.projections()):
                exprs = self._seq(row)
                if len(exprs) != len(out_names):
                    raise DialectError(
                        "Expand projection arity mismatch — not unparsable")
                sel = ", ".join(
                    f"{self._expr_sql(e)} AS {q}{n}{q}"
                    for e, n in zip(exprs, out_names))
                branches.append(f"SELECT {sel} FROM {factor}")
            return _Block(
                from_=f"({' UNION ALL '.join(branches)}) AS {self._alias()}")
        raise DialectError(f"unsupported plan node for unparsing: {cls}")


def to_sql(df, dialect: Dialect = SPARK, validate: bool = True) -> str:
    """Unparse a DataFrame's analyzed logical plan to SQL text.

    ``spark.sql(to_sql(df))`` returns the same rows as ``df`` (the
    reference validates plan_to_sql the same way: roundtrip_statement
    tests in unparser/plan.rs).  Raises DialectError on plan shapes
    with no faithful SQL rendering in the target dialect.

    validate (Spark dialect only): re-analyze the emitted text and both
    refuse non-analyzable renderings (e.g. an unregistered Python UDF's
    bare name) and require the round-trip SCHEMA to match — a column
    count/name drift means the text silently computes something else.
    Costs one driver-side analysis pass, no execution.
    """
    plan = df._jdf.queryExecution().analyzed()
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone") or "UTC"
    text = _render_schema_exact(_Unparser(
        dialect, session_tz=tz,
        validated=validate and dialect.name == "spark").visit(plan))
    if dialect.name != "spark":
        text = _strip_literal_suffixes(text)
    if dialect.name == "duckdb":
        text = _refuse_int_subscripts(text)
        text = _map_string_subscripts(text)
        text = _fix_listagg(text)
        text = _rewrite_functions(text, _DUCKDB_FN_RULES)
        text = _rewrite_xor(text)
        text = _fix_negative_frame_bounds(text)
        text = _duckdb_token_rewrites(text)
        # DuckDB's TIMESTAMP IS timezone-naive — Spark's TIMESTAMP_NTZ
        # type token maps to it directly
        import re as _re

        text = "".join(
            s if is_lit else _re.sub(r"\bTIMESTAMP_NTZ\b", "TIMESTAMP", s)
            for is_lit, s in _Unparser._literal_segments(text))
        text = _like_escape_duckdb(text)
        text = _reescape_literals_duckdb(text)  # must run LAST
    if validate and dialect.name == "spark":
        from pyspark.errors.exceptions.captured import CapturedException

        try:
            reparsed = df.sparkSession.sql(text)
            re_cols = reparsed.columns
        except CapturedException as e:
            raise DialectError(
                "emitted SQL does not re-analyze: "
                + str(e).splitlines()[0][:160]) from e
        if re_cols != df.columns:
            raise DialectError(
                f"round-trip schema drift: {df.columns} -> {re_cols}")
        # TYPES too (incl. nested struct field names — the class the
        # struct-name and complex-cast repairs fix is exactly a type
        # drift with identical values, invisible to a row compare);
        # nullability excluded: re-analysis legitimately re-infers it.
        # TIMESTAMP_NTZ↔TIMESTAMP tolerated under a UTC session only:
        # the DataFrame parquet reader infers NTZ where the re-parsed
        # `parquet.` file factor analyzes LTZ — same stored micros,
        # identical wall-clock values when the session is UTC (the
        # repo-wide pin); any other tz keeps the strict check.
        tz_utc = (tz or "UTC").upper() in ("UTC", "ETC/UTC", "Z")

        def _norm(t: str) -> str:
            return t.replace("timestamp_ntz", "timestamp") if tz_utc else t

        want = [_norm(f.dataType.simpleString()) for f in df.schema.fields]
        got = [_norm(f.dataType.simpleString())
               for f in reparsed.schema.fields]
        if got != want:
            raise DialectError(
                f"round-trip type drift: {want} -> {got}")
    return text


def plan_to_sql(df, dialect: Dialect = SPARK, validate: bool = True) -> str:
    """Reference-name alias (unparser/plan.rs exports plan_to_sql)."""
    return to_sql(df, dialect, validate)


class Unparser:
    """Reference-shape wrapper (unparser/mod.rs Unparser::new(dialect)):
    holds a dialect and exposes plan_to_sql.  ``with_pretty`` is accepted
    for API parity; the emitted text is single-line either way (Spark
    re-parses both identically)."""

    def __init__(self, dialect: Dialect = SPARK):
        self.dialect = dialect
        self._pretty = False

    def with_pretty(self, pretty: bool) -> "Unparser":
        self._pretty = pretty
        return self

    def plan_to_sql(self, df, validate: bool = True) -> str:
        return to_sql(df, self.dialect, validate)


def expr_to_sql(df, col, dialect: Dialect = SPARK) -> str:
    """Single-expression unparse (reference unparser exports expr_to_sql
    alongside plan_to_sql).  Takes the DataFrame the Column resolves
    against (Spark 4 Columns are unresolved nodes until analysis) plus
    the Column; applies the same non-reparsable-rendering checks as plan
    unparsing and returns text usable in selectExpr/spark.sql."""
    plan = df.select(col)._jdf.queryExecution().analyzed()
    # an aggregate-function Column analyzes to a global Aggregate node,
    # anything else to a Project
    if plan.getClass().getSimpleName() == "Aggregate":
        exprs = plan.aggregateExpressions()
    else:
        exprs = plan.projectList()
    return _Unparser(dialect)._expr_sql(exprs.apply(exprs.size() - 1))
