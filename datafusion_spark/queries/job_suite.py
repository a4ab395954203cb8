"""JOB (Join Order Benchmark / IMDB) suite adapted to the star schema.

Reference: benchmarks/queries/imdb/1a.sql .. 33c.sql — the 113-query suite
DataFusion uses as its join-REORDERING acceptance benchmark: deep comma-join
graphs (5-8 relations), transitive join keys (t.id = mc.movie_id AND
mc.movie_id = mi.movie_id), highly selective string predicates on small
dimensions, and MIN() outputs with no GROUP BY.

The IMDB tables aren't in the driver testdata, so each family is re-expressed
on the TPC-H-ish schema PRESERVING its join graph and predicate structure:

    title          -> orders      (fact hub, key o_orderkey)
    movie_companies/movie_info/movie_keyword/cast_info
                   -> lineitem    (bridge facts, aliased per role; the
                                   redundant transitive equalities between
                                   bridges are kept verbatim)
    company_type/info_type/keyword/role_type
                   -> part        (typed dim: =/LIKE/IN on p_type, p_name)
    company_name/name -> supplier / customer (entity dims, LIKE on names)
    country_code   -> nation (via s_nationkey / c_nationkey)

The SQL text is fully portable: the SAME string is the Spark plan (via
spark.sql over registered views) and the DuckDB oracle — so the correctness
gate also proves the SQL frontend handles comma-join syntax.  What the suite
exercises on Spark: Catalyst's join-graph extraction from WHERE equalities,
CBO+AQE join reordering, broadcast selection for the dim legs, and transitive
predicate inference.  At 100 TB the wanted plan per query: every dim leg
broadcast, bridge-bridge joins co-partitioned on l_orderkey, zero shuffles
before the single-row aggregate (asserted in tests/test_plan_budgets.py).
"""

from __future__ import annotations

from datafusion_spark.catalog import register_views
from datafusion_spark.queries.registry import query

_JOB: dict[str, str] = {}

# --- family 1 (ref 1a/1b): t + two bridges + 2 typed dims -------------------
_JOB["job_1a"] = """
SELECT MIN(mc.l_shipdate) AS first_ship, MIN(t.o_orderdate) AS first_order,
       MIN(t.o_totalprice) AS min_price
FROM supplier AS ct, part AS it, lineitem AS mc, lineitem AS mi_idx, orders AS t
WHERE ct.s_acctbal > 5000
  AND it.p_type = 'PROMO'
  AND mc.l_returnflag <> 'R' AND (mc.l_linestatus = 'O' OR mc.l_discount > 0.05)
  AND ct.s_suppkey = mc.l_suppkey
  AND t.o_orderkey = mc.l_orderkey
  AND t.o_orderkey = mi_idx.l_orderkey
  AND mc.l_orderkey = mi_idx.l_orderkey
  AND it.p_partkey = mi_idx.l_partkey
"""
# Replace l_shipdate/l_returnflag with alternate selectivities (ref 1b).
_JOB["job_1b"] = """
SELECT MIN(t.o_orderdate) AS movie_year, MIN(mc.l_extendedprice) AS min_note_price
FROM supplier AS ct, part AS it, lineitem AS mc, lineitem AS mi_idx, orders AS t
WHERE ct.s_acctbal BETWEEN 0 AND 3000
  AND it.p_type = 'ECONOMY'
  AND mc.l_quantity < 10
  AND t.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1998-12-31'
  AND ct.s_suppkey = mc.l_suppkey
  AND t.o_orderkey = mc.l_orderkey
  AND t.o_orderkey = mi_idx.l_orderkey
  AND mc.l_orderkey = mi_idx.l_orderkey
  AND it.p_partkey = mi_idx.l_partkey
"""

# --- family 2 (ref 2a/2b): country-coded entity dim + keyword dim ----------
_JOB["job_2a"] = """
SELECT MIN(t.o_orderdate) AS movie_title
FROM nation AS cn, customer AS c, part AS k, lineitem AS mc, lineitem AS mk,
     orders AS t
WHERE cn.n_name = 'NATION_7'
  AND k.p_name = 'red widget'
  AND cn.n_nationkey = c.c_nationkey
  AND c.c_custkey = t.o_custkey
  AND mc.l_orderkey = t.o_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND mk.l_partkey = k.p_partkey
  AND mc.l_orderkey = mk.l_orderkey
"""
_JOB["job_2b"] = """
SELECT MIN(t.o_orderdate) AS movie_title
FROM nation AS cn, customer AS c, part AS k, lineitem AS mc, lineitem AS mk,
     orders AS t
WHERE cn.n_name = 'NATION_3'
  AND k.p_name = 'blue bolt'
  AND cn.n_nationkey = c.c_nationkey
  AND c.c_custkey = t.o_custkey
  AND mc.l_orderkey = t.o_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND mk.l_partkey = k.p_partkey
  AND mc.l_orderkey = mk.l_orderkey
"""

# --- family 3 (ref 3a/3b): LIKE keyword + IN-list bridge pred + year range --
_JOB["job_3a"] = """
SELECT MIN(t.o_orderdate) AS movie_title
FROM part AS k, lineitem AS mi, lineitem AS mk, orders AS t
WHERE k.p_name LIKE '%widget%'
  AND mi.l_returnflag IN ('A', 'N')
  AND t.o_orderdate > DATE '1998-01-01'
  AND t.o_orderkey = mi.l_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND mk.l_orderkey = mi.l_orderkey
  AND k.p_partkey = mk.l_partkey
"""
_JOB["job_3b"] = """
SELECT MIN(t.o_orderdate) AS movie_title
FROM part AS k, lineitem AS mi, lineitem AS mk, orders AS t
WHERE k.p_name LIKE '%bolt%'
  AND mi.l_linestatus IN ('F')
  AND t.o_orderdate > DATE '2000-01-01'
  AND t.o_orderkey = mi.l_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND mk.l_orderkey = mi.l_orderkey
  AND k.p_partkey = mk.l_partkey
"""

# --- family 4 (ref 4a): rating threshold on a bridge measure ----------------
_JOB["job_4a"] = """
SELECT MIN(mi_idx.l_quantity) AS rating, MIN(t.o_orderdate) AS movie_title
FROM part AS it, part AS k, lineitem AS mi_idx, lineitem AS mk, orders AS t
WHERE it.p_type = 'STANDARD'
  AND k.p_name LIKE '%ring%'
  AND mi_idx.l_quantity > 25
  AND t.o_orderdate > DATE '1999-01-01'
  AND t.o_orderkey = mi_idx.l_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND mk.l_orderkey = mi_idx.l_orderkey
  AND k.p_partkey = mk.l_partkey
  AND it.p_partkey = mi_idx.l_partkey
"""

# --- family 5 (ref 5a): two-LIKE conjunction on the bridge ------------------
_JOB["job_5a"] = """
SELECT MIN(t.o_orderdate) AS typical_european_movie
FROM supplier AS ct, lineitem AS mc, lineitem AS mi, orders AS t, nation AS n
WHERE ct.s_name LIKE '%001%'
  AND mc.l_discount >= 0.05 AND mc.l_discount <= 0.07
  AND mi.l_returnflag IN ('A', 'N', 'R')
  AND t.o_orderdate > DATE '1997-01-01'
  AND n.n_name LIKE 'NATION_1%'
  AND t.o_orderkey = mi.l_orderkey
  AND t.o_orderkey = mc.l_orderkey
  AND mc.l_orderkey = mi.l_orderkey
  AND ct.s_suppkey = mc.l_suppkey
  AND n.n_nationkey = ct.s_nationkey
"""

# --- family 6 (ref 6a): keyword equality + entity LIKE + year ---------------
_JOB["job_6a"] = """
SELECT MIN(k.p_name) AS movie_keyword, MIN(n.s_name) AS actor_name,
       MIN(t.o_orderdate) AS marvel_movie
FROM lineitem AS ci, part AS k, lineitem AS mk, supplier AS n, orders AS t
WHERE k.p_name = 'small ring'
  AND n.s_name LIKE '%00001%'
  AND t.o_orderdate > DATE '1996-06-01'
  AND k.p_partkey = mk.l_partkey
  AND t.o_orderkey = mk.l_orderkey
  AND t.o_orderkey = ci.l_orderkey
  AND ci.l_orderkey = mk.l_orderkey
  AND n.s_suppkey = ci.l_suppkey
"""

# --- family 7 (ref 7a): 8 relations, disjunctive entity predicate -----------
_JOB["job_7a"] = """
SELECT MIN(n.c_name) AS of_person, MIN(t.o_orderdate) AS biography_movie
FROM customer AS an, lineitem AS ci, part AS it, region AS lt, nation AS ml,
     customer AS n, orders AS pi, orders AS t
WHERE an.c_name LIKE '%1%'
  AND it.p_type = 'MEDIUM'
  AND lt.r_name = 'ASIA'
  AND n.c_name BETWEEN 'Customer#000000100' AND 'Customer#000000600'
  AND (n.c_mktsegment = 'BUILDING'
       OR (n.c_mktsegment = 'AUTOMOBILE' AND n.c_name LIKE '%2%'))
  AND pi.o_orderpriority = '1-URGENT'
  AND t.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1999-12-31'
  AND n.c_custkey = an.c_custkey
  AND n.c_custkey = pi.o_custkey
  AND ci.l_orderkey = t.o_orderkey
  AND ml.n_regionkey = lt.r_regionkey
  AND ml.n_nationkey = n.c_nationkey
  AND it.p_partkey = ci.l_partkey
  AND pi.o_custkey = an.c_custkey
  AND t.o_custkey = n.c_custkey
"""

# --- family 8 (ref 8a): voice-note conjunction, country-coded company -------
_JOB["job_8a"] = """
SELECT MIN(an1.c_name) AS actress_pseudonym, MIN(t.o_orderdate) AS japanese_movie_dubbed
FROM customer AS an1, lineitem AS ci, nation AS cn, lineitem AS mc,
     customer AS n1, part AS rt, orders AS t
WHERE ci.l_returnflag = 'N' AND ci.l_linestatus = 'O'
  AND cn.n_name = 'NATION_11'
  AND mc.l_discount >= 0.02 AND mc.l_tax < 0.05
  AND n1.c_name LIKE '%3%' AND n1.c_name NOT LIKE '%8%'
  AND rt.p_type = 'LARGE'
  AND an1.c_custkey = n1.c_custkey
  AND n1.c_custkey = t.o_custkey
  AND ci.l_orderkey = t.o_orderkey
  AND t.o_orderkey = mc.l_orderkey
  AND cn.n_nationkey = n1.c_nationkey
  AND ci.l_partkey = rt.p_partkey
  AND ci.l_orderkey = mc.l_orderkey
"""

# --- family 9 (ref 9a): IN-list bridge pred + gendered entity LIKE ----------
_JOB["job_9a"] = """
SELECT MIN(an.c_name) AS alternative_name, MIN(chn.s_name) AS character_name,
       MIN(t.o_orderdate) AS movie
FROM customer AS an, supplier AS chn, lineitem AS ci, nation AS cn,
     lineitem AS mc, customer AS n, part AS rt, orders AS t
WHERE ci.l_returnflag IN ('A', 'N')
  AND cn.n_name = 'NATION_19'
  AND mc.l_quantity BETWEEN 5 AND 40
  AND n.c_mktsegment = 'FURNITURE' AND n.c_name LIKE '%5%'
  AND rt.p_type = 'SMALL'
  AND t.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '2000-12-31'
  AND ci.l_orderkey = t.o_orderkey
  AND t.o_orderkey = mc.l_orderkey
  AND ci.l_orderkey = mc.l_orderkey
  AND cn.n_nationkey = n.c_nationkey
  AND ci.l_partkey = rt.p_partkey
  AND n.c_custkey = t.o_custkey
  AND chn.s_suppkey = ci.l_suppkey
  AND an.c_custkey = n.c_custkey
"""

# --- family 10 (ref 10a/10b/10c): two typed dims on one bridge --------------
_JOB["job_10a"] = """
SELECT MIN(chn.s_name) AS uncredited_voiced_character, MIN(t.o_orderdate) AS russian_movie
FROM supplier AS chn, lineitem AS ci, nation AS cn, part AS ct,
     lineitem AS mc, part AS rt, orders AS t
WHERE ci.l_discount >= 0.04 AND ci.l_returnflag = 'R'
  AND cn.n_name = 'NATION_21'
  AND rt.p_type = 'PROMO'
  AND t.o_orderdate > DATE '1999-01-01'
  AND t.o_orderkey = mc.l_orderkey
  AND t.o_orderkey = ci.l_orderkey
  AND ci.l_orderkey = mc.l_orderkey
  AND chn.s_suppkey = ci.l_suppkey
  AND rt.p_partkey = ci.l_partkey
  AND cn.n_nationkey = chn.s_nationkey
  AND ct.p_partkey = mc.l_partkey
"""
_JOB["job_10b"] = """
SELECT MIN(chn.s_name) AS character_name, MIN(t.o_orderdate) AS russian_mov_with_actor_producer
FROM supplier AS chn, lineitem AS ci, nation AS cn, part AS ct,
     lineitem AS mc, part AS rt, orders AS t
WHERE ci.l_returnflag = 'N'
  AND cn.n_name = 'NATION_2'
  AND rt.p_type = 'STANDARD'
  AND t.o_orderdate > DATE '2000-01-01'
  AND t.o_orderkey = mc.l_orderkey
  AND t.o_orderkey = ci.l_orderkey
  AND ci.l_orderkey = mc.l_orderkey
  AND chn.s_suppkey = ci.l_suppkey
  AND rt.p_partkey = ci.l_partkey
  AND cn.n_nationkey = chn.s_nationkey
  AND ct.p_partkey = mc.l_partkey
"""
_JOB["job_10c"] = """
SELECT MIN(chn.s_name) AS character_name, MIN(t.o_orderdate) AS movie_with_american_producer
FROM supplier AS chn, lineitem AS ci, nation AS cn, part AS ct,
     lineitem AS mc, part AS rt, orders AS t
WHERE ci.l_quantity > 30
  AND cn.n_name LIKE 'NATION_1%'
  AND rt.p_type = 'ECONOMY'
  AND t.o_orderdate > DATE '1995-06-01'
  AND t.o_orderkey = mc.l_orderkey
  AND t.o_orderkey = ci.l_orderkey
  AND ci.l_orderkey = mc.l_orderkey
  AND chn.s_suppkey = ci.l_suppkey
  AND rt.p_partkey = ci.l_partkey
  AND cn.n_nationkey = chn.s_nationkey
  AND ct.p_partkey = mc.l_partkey
"""


def _register(name: str, sql: str) -> None:
    def fn(spark, sf_dir, _sql=sql):
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    fn.__name__ = name
    ref = name.replace("job_", "")
    fn.__doc__ = (
        f"JOB {ref} join graph (reference benchmarks/queries/imdb/{ref}.sql) "
        "re-keyed onto the star schema; same SQL text runs on Spark and DuckDB."
    )
    tags = ("job", "join", "optimizer") + (("bench",) if name in ("job_7a", "job_9a") else ())
    query(name, oracle=sql, tags=tags)(fn)


for _name, _sql in _JOB.items():
    _register(_name, _sql)

# --- families 11-17 (ref 11a..17a): three/four bridge facts, dual typed
# dims (it1/it2), chained dim legs (kind_type -> customer->nation->region),
# <>/IS NULL/LIKE-disjunction predicates --------------------------------------
_JOB2: dict[str, str] = {}

_JOB2["job_11a"] = """
SELECT MIN(cn.s_name) AS from_company, MIN(lt.p_name) AS movie_link_type,
       MIN(t.o_orderdate) AS non_polish_sequel_movie
FROM supplier AS cn, nation AS nn, part AS ct, part AS k, part AS lt,
     lineitem AS mc, lineitem AS mk, lineitem AS ml, orders AS t
WHERE nn.n_name <> 'NATION_5'
  AND (cn.s_name LIKE '%001%' OR cn.s_name LIKE '%002%')
  AND ct.p_type = 'PROMO'
  AND k.p_name = 'red widget'
  AND lt.p_name LIKE '%bolt%'
  AND NULLIF(mc.l_tax, 0.0) IS NULL
  AND t.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '2000-12-31'
  AND lt.p_partkey = ml.l_partkey
  AND ml.l_orderkey = t.o_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND mk.l_partkey = k.p_partkey
  AND t.o_orderkey = mc.l_orderkey
  AND mc.l_suppkey = cn.s_suppkey
  AND nn.n_nationkey = cn.s_nationkey
  AND ct.p_partkey = mc.l_partkey
  AND ml.l_orderkey = mk.l_orderkey
  AND ml.l_orderkey = mc.l_orderkey
  AND mk.l_orderkey = mc.l_orderkey
"""

_JOB2["job_12a"] = """
SELECT MIN(cn.s_name) AS movie_company, MIN(mi_idx.l_quantity) AS rating,
       MIN(t.o_orderdate) AS drama_horror_movie
FROM supplier AS cn, nation AS nn, part AS ct, part AS it1, part AS it2,
     lineitem AS mc, lineitem AS mi, lineitem AS mi_idx, orders AS t
WHERE nn.n_name = 'NATION_4'
  AND ct.p_type = 'PROMO'
  AND it1.p_type = 'MEDIUM'
  AND it2.p_type = 'STANDARD'
  AND mi.l_returnflag IN ('A', 'N')
  AND mi_idx.l_quantity > 40
  AND t.o_orderdate BETWEEN DATE '1997-01-01' AND DATE '1999-12-31'
  AND t.o_orderkey = mi.l_orderkey
  AND t.o_orderkey = mi_idx.l_orderkey
  AND mi.l_partkey = it1.p_partkey
  AND mi_idx.l_partkey = it2.p_partkey
  AND t.o_orderkey = mc.l_orderkey
  AND ct.p_partkey = mc.l_partkey
  AND cn.s_suppkey = mc.l_suppkey
  AND nn.n_nationkey = cn.s_nationkey
  AND mc.l_orderkey = mi.l_orderkey
  AND mc.l_orderkey = mi_idx.l_orderkey
  AND mi.l_orderkey = mi_idx.l_orderkey
"""

_JOB2["job_13a"] = """
SELECT MIN(mi.l_shipdate) AS release_date, MIN(miidx.l_quantity) AS rating,
       MIN(t.o_orderdate) AS german_movie
FROM supplier AS cn, nation AS nn, part AS ct, part AS it, part AS it2,
     customer AS c, nation AS kn, region AS kt,
     lineitem AS mc, lineitem AS mi, lineitem AS miidx, orders AS t
WHERE nn.n_name = 'NATION_8'
  AND ct.p_type = 'PROMO'
  AND it.p_type = 'STANDARD'
  AND it2.p_type = 'ECONOMY'
  AND kt.r_name = 'ASIA'
  AND mi.l_orderkey = t.o_orderkey
  AND it2.p_partkey = mi.l_partkey
  AND kt.r_regionkey = kn.n_regionkey
  AND kn.n_nationkey = c.c_nationkey
  AND c.c_custkey = t.o_custkey
  AND mc.l_orderkey = t.o_orderkey
  AND cn.s_suppkey = mc.l_suppkey
  AND nn.n_nationkey = cn.s_nationkey
  AND ct.p_partkey = mc.l_partkey
  AND miidx.l_orderkey = t.o_orderkey
  AND it.p_partkey = miidx.l_partkey
  AND mi.l_orderkey = miidx.l_orderkey
  AND mi.l_orderkey = mc.l_orderkey
  AND miidx.l_orderkey = mc.l_orderkey
"""

_JOB2["job_14a"] = """
SELECT MIN(mi_idx.l_quantity) AS rating, MIN(t.o_orderdate) AS northern_dark_movie
FROM part AS it1, part AS it2, part AS k,
     customer AS c, nation AS kn, region AS kt,
     lineitem AS mi, lineitem AS mi_idx, lineitem AS mk, orders AS t
WHERE it1.p_type = 'LARGE'
  AND it2.p_type = 'SMALL'
  AND k.p_name IN ('red widget', 'blue bolt', 'small ring', 'green gear')
  AND kt.r_name = 'EUROPE'
  AND mi.l_returnflag IN ('A', 'N', 'R')
  AND mi_idx.l_quantity < 45
  AND t.o_orderdate > DATE '1998-01-01'
  AND kt.r_regionkey = kn.n_regionkey
  AND kn.n_nationkey = c.c_nationkey
  AND c.c_custkey = t.o_custkey
  AND t.o_orderkey = mi.l_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND t.o_orderkey = mi_idx.l_orderkey
  AND mk.l_orderkey = mi.l_orderkey
  AND mk.l_orderkey = mi_idx.l_orderkey
  AND mi.l_orderkey = mi_idx.l_orderkey
  AND k.p_partkey = mk.l_partkey
  AND it1.p_partkey = mi.l_partkey
  AND it2.p_partkey = mi_idx.l_partkey
"""

_JOB2["job_15a"] = """
SELECT MIN(mi.l_shipdate) AS release_date, MIN(t.o_orderdate) AS internet_movie
FROM lineitem AS at2, supplier AS cn, nation AS nn, part AS ct, part AS it1,
     part AS k, lineitem AS mc, lineitem AS mi, lineitem AS mk, orders AS t
WHERE nn.n_name = 'NATION_6'
  AND it1.p_type = 'ECONOMY'
  AND mc.l_discount >= 0.03 AND mc.l_discount <= 0.08
  AND mi.l_quantity BETWEEN 10 AND 45
  AND t.o_orderdate > DATE '1996-01-01'
  AND t.o_orderkey = at2.l_orderkey
  AND t.o_orderkey = mi.l_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND t.o_orderkey = mc.l_orderkey
  AND mk.l_orderkey = mi.l_orderkey
  AND mk.l_orderkey = mc.l_orderkey
  AND mk.l_orderkey = at2.l_orderkey
  AND mi.l_orderkey = mc.l_orderkey
  AND mi.l_orderkey = at2.l_orderkey
  AND mc.l_orderkey = at2.l_orderkey
  AND k.p_partkey = mk.l_partkey
  AND it1.p_partkey = mi.l_partkey
  AND cn.s_suppkey = mc.l_suppkey
  AND nn.n_nationkey = cn.s_nationkey
  AND ct.p_partkey = mc.l_partkey
"""

_JOB2["job_16a"] = """
SELECT MIN(an.c_name) AS cool_actor_pseudonym,
       MIN(t.o_orderdate) AS series_named_after_char
FROM customer AS an, lineitem AS ci, supplier AS cns, nation AS cn,
     part AS k, lineitem AS mc, lineitem AS mk, customer AS n, orders AS t
WHERE cn.n_name = 'NATION_9'
  AND k.p_name = 'small ring'
  AND t.o_totalprice >= 50000 AND t.o_totalprice < 200000
  AND an.c_custkey = n.c_custkey
  AND n.c_custkey = t.o_custkey
  AND ci.l_orderkey = t.o_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND mk.l_partkey = k.p_partkey
  AND t.o_orderkey = mc.l_orderkey
  AND mc.l_suppkey = cns.s_suppkey
  AND cn.n_nationkey = cns.s_nationkey
  AND ci.l_orderkey = mc.l_orderkey
  AND ci.l_orderkey = mk.l_orderkey
  AND mc.l_orderkey = mk.l_orderkey
"""

_JOB2["job_17a"] = """
SELECT MIN(n.c_name) AS member_in_charnamed_american_movie, MIN(n.c_name) AS a1
FROM lineitem AS ci, supplier AS cns, nation AS cn, part AS k,
     lineitem AS mc, lineitem AS mk, customer AS n, orders AS t
WHERE cn.n_name = 'NATION_12'
  AND k.p_name = 'blue bolt'
  AND n.c_name LIKE 'Customer#0000001%'
  AND n.c_custkey = t.o_custkey
  AND ci.l_orderkey = t.o_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND mk.l_partkey = k.p_partkey
  AND t.o_orderkey = mc.l_orderkey
  AND mc.l_suppkey = cns.s_suppkey
  AND cn.n_nationkey = cns.s_nationkey
  AND ci.l_orderkey = mc.l_orderkey
  AND ci.l_orderkey = mk.l_orderkey
  AND mc.l_orderkey = mk.l_orderkey
"""

for _name, _sql in _JOB2.items():
    _register(_name, _sql)

# b-variants of families 11-17 (reference 11b..17b): identical join graphs,
# shifted predicate selectivities — the pairs exercise whether the
# optimizer's ordering survives constant changes.
_JOB2B = {
    "job_11b": _JOB2["job_11a"]
    .replace("NATION_5", "NATION_20")
    .replace("'%001%'", "'%003%'").replace("'%002%'", "'%004%'")
    .replace("'PROMO'", "'LARGE'")
    .replace("'red widget'", "'small ring'")
    .replace("'%bolt%'", "'%gear%'")
    .replace("DATE '1995-01-01' AND DATE '2000-12-31'",
             "DATE '1997-01-01' AND DATE '2001-12-31'"),
    "job_12b": _JOB2["job_12a"]
    .replace("NATION_4", "NATION_14")
    .replace("'PROMO'", "'SMALL'").replace("'MEDIUM'", "'LARGE'")
    .replace("'STANDARD'", "'ECONOMY'")
    .replace("l_quantity > 40", "l_quantity > 30")
    .replace("DATE '1997-01-01' AND DATE '1999-12-31'",
             "DATE '1995-06-01' AND DATE '1998-06-30'"),
    "job_14b": _JOB2["job_14a"]
    .replace("'LARGE'", "'PROMO'").replace("'SMALL'", "'MEDIUM'")
    .replace("'EUROPE'", "'AMERICA'")
    .replace("l_quantity < 45", "l_quantity < 25")
    .replace("DATE '1998-01-01'", "DATE '1996-01-01'"),
    "job_17b": _JOB2["job_17a"]
    .replace("NATION_12", "NATION_22")
    .replace("'blue bolt'", "'red widget'")
    .replace("'Customer#0000001%'", "'Customer#0000004%'"),
}
for _name, _sql in _JOB2B.items():
    _register(_name, _sql)

# --- families 18-22 (ref 18a..22a): producer IN-lists, 10-relation graphs,
# dual tiny type-dims on one entity bridge, FOUR-bridge transitive cliques --
_JOB3: dict[str, str] = {}

_JOB3["job_18a"] = """
SELECT MIN(mi.l_shipdate) AS movie_budget, MIN(mi_idx.l_quantity) AS movie_votes,
       MIN(t.o_orderdate) AS movie_title
FROM lineitem AS ci, part AS it1, part AS it2, lineitem AS mi,
     lineitem AS mi_idx, supplier AS n, orders AS t
WHERE ci.l_returnflag IN ('A', 'R')
  AND it1.p_type = 'PROMO'
  AND it2.p_type = 'STANDARD'
  AND n.s_acctbal > 0 AND n.s_name LIKE '%7%'
  AND t.o_orderkey = mi.l_orderkey
  AND t.o_orderkey = mi_idx.l_orderkey
  AND t.o_orderkey = ci.l_orderkey
  AND ci.l_orderkey = mi.l_orderkey
  AND ci.l_orderkey = mi_idx.l_orderkey
  AND mi.l_orderkey = mi_idx.l_orderkey
  AND n.s_suppkey = ci.l_suppkey
  AND it1.p_partkey = mi.l_partkey
  AND it2.p_partkey = mi_idx.l_partkey
"""

_JOB3["job_19a"] = """
SELECT MIN(n.c_name) AS voicing_actress, MIN(t.o_orderdate) AS voiced_movie
FROM customer AS an, supplier AS chn, lineitem AS ci, nation AS cn,
     part AS it, lineitem AS mc, lineitem AS mi, customer AS n,
     part AS rt, orders AS t
WHERE ci.l_returnflag IN ('A', 'N', 'R')
  AND cn.n_name = 'NATION_15'
  AND it.p_type = 'MEDIUM'
  AND mc.l_tax IS NOT NULL AND (mc.l_discount >= 0.06 OR mc.l_tax >= 0.06)
  AND mi.l_quantity IS NOT NULL AND (mi.l_quantity < 15 OR mi.l_quantity > 35)
  AND n.c_mktsegment = 'HOUSEHOLD' AND n.c_name LIKE '%9%'
  AND rt.p_type = 'SMALL'
  AND t.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '2000-12-31'
  AND t.o_orderkey = mi.l_orderkey
  AND t.o_orderkey = mc.l_orderkey
  AND t.o_orderkey = ci.l_orderkey
  AND mc.l_orderkey = ci.l_orderkey
  AND mc.l_orderkey = mi.l_orderkey
  AND mi.l_orderkey = ci.l_orderkey
  AND cn.n_nationkey = n.c_nationkey
  AND it.p_partkey = mi.l_partkey
  AND n.c_custkey = t.o_custkey
  AND rt.p_partkey = ci.l_partkey
  AND n.c_custkey = an.c_custkey
  AND chn.s_suppkey = ci.l_suppkey
"""

_JOB3["job_20a"] = """
SELECT MIN(t.o_orderdate) AS complete_downey_ironman_movie
FROM customer AS cc, nation AS cct1, region AS cct2, supplier AS chn,
     lineitem AS ci, part AS k, part AS kt, lineitem AS mk, orders AS t
WHERE cct1.n_name LIKE 'NATION_1%'
  AND cct2.r_name LIKE '%E%'
  AND chn.s_name NOT LIKE '%9%'
  AND (chn.s_name LIKE '%01%' OR chn.s_name LIKE '%02%')
  AND k.p_name IN ('red widget', 'blue bolt', 'small ring', 'green gear',
                   'large cog')
  AND kt.p_type = 'LARGE'
  AND t.o_orderdate > DATE '1995-06-01'
  AND kt.p_partkey = ci.l_partkey
  AND t.o_orderkey = mk.l_orderkey
  AND t.o_orderkey = ci.l_orderkey
  AND t.o_custkey = cc.c_custkey
  AND mk.l_orderkey = ci.l_orderkey
  AND chn.s_suppkey = ci.l_suppkey
  AND k.p_partkey = mk.l_partkey
  AND cct1.n_nationkey = cc.c_nationkey
  AND cct2.r_regionkey = cct1.n_regionkey
"""

_JOB3["job_21a"] = """
SELECT MIN(cn.s_name) AS company_name, MIN(lt.p_name) AS link_type,
       MIN(t.o_orderdate) AS western_follow_up
FROM supplier AS cn, nation AS nn, part AS ct, part AS k, part AS lt,
     lineitem AS mc, lineitem AS mi, lineitem AS mk, lineitem AS ml,
     orders AS t
WHERE nn.n_name <> 'NATION_5'
  AND (cn.s_name LIKE '%001%' OR cn.s_name LIKE '%002%')
  AND ct.p_type = 'PROMO'
  AND k.p_name = 'red widget'
  AND lt.p_name LIKE '%bolt%'
  AND NULLIF(mc.l_tax, 0.0) IS NULL
  AND mi.l_returnflag IN ('A', 'N')
  AND t.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '2000-12-31'
  AND lt.p_partkey = ml.l_partkey
  AND ml.l_orderkey = t.o_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND mk.l_partkey = k.p_partkey
  AND t.o_orderkey = mc.l_orderkey
  AND mc.l_suppkey = cn.s_suppkey
  AND nn.n_nationkey = cn.s_nationkey
  AND ct.p_partkey = mc.l_partkey
  AND mi.l_orderkey = t.o_orderkey
  AND ml.l_orderkey = mk.l_orderkey
  AND ml.l_orderkey = mc.l_orderkey
  AND mk.l_orderkey = mc.l_orderkey
  AND ml.l_orderkey = mi.l_orderkey
  AND mk.l_orderkey = mi.l_orderkey
  AND mc.l_orderkey = mi.l_orderkey
"""

_JOB3["job_22a"] = """
SELECT MIN(cn.s_name) AS movie_company, MIN(mi_idx.l_quantity) AS rating,
       MIN(t.o_orderdate) AS western_violent_movie
FROM supplier AS cn, nation AS nn, part AS ct, part AS it1, part AS it2,
     part AS k, customer AS c, nation AS kn,
     lineitem AS mc, lineitem AS mi, lineitem AS mi_idx, lineitem AS mk,
     orders AS t
WHERE nn.n_name <> 'NATION_0'
  AND it1.p_type = 'LARGE'
  AND it2.p_type = 'SMALL'
  AND k.p_name IN ('red widget', 'blue bolt', 'small ring', 'green gear')
  AND kn.n_name LIKE 'NATION_%'
  AND mc.l_discount >= 0.01 AND mc.l_returnflag <> 'R'
  AND mi.l_returnflag IN ('A', 'N')
  AND mi_idx.l_quantity < 35
  AND t.o_orderdate > DATE '1997-01-01'
  AND kn.n_nationkey = c.c_nationkey
  AND c.c_custkey = t.o_custkey
  AND t.o_orderkey = mi.l_orderkey
  AND t.o_orderkey = mk.l_orderkey
  AND t.o_orderkey = mi_idx.l_orderkey
  AND t.o_orderkey = mc.l_orderkey
  AND mk.l_orderkey = mi.l_orderkey
  AND mk.l_orderkey = mi_idx.l_orderkey
  AND mk.l_orderkey = mc.l_orderkey
  AND mi.l_orderkey = mi_idx.l_orderkey
  AND mi.l_orderkey = mc.l_orderkey
  AND mc.l_orderkey = mi_idx.l_orderkey
  AND k.p_partkey = mk.l_partkey
  AND it1.p_partkey = mi.l_partkey
  AND it2.p_partkey = mi_idx.l_partkey
  AND ct.p_partkey = mc.l_partkey
  AND cn.s_suppkey = mc.l_suppkey
  AND nn.n_nationkey = cn.s_nationkey
"""

for _name, _sql in _JOB3.items():
    _register(_name, _sql)
