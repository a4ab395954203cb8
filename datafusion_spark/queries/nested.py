"""Nested types: arrays, explode/unnest, lambdas, structs, sequences.

Reference: datafusion/functions-nested/src/ (array_element, array_slice,
array_has, array_position, array_distinct, flatten, ...), physical-plan
unnest.rs, and functions-table/src (generate_series).

Spark-first notes: explode/posexplode are the Unnest equivalents and run
inside whole-stage codegen; higher-order functions (transform/aggregate/
zip_with/filter) evaluate JVM-side — no Python UDF needed for array math.
Exact-sum determinism for float arrays uses per-element decimal casts in
the fold, same trick as the scalar aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "nested_posexplode_tokens",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS BIGINT) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 20
    """,
    tags=("nested", "unnest"),
)
def nested_posexplode_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).withColumn("pos", F.col("pos").cast("long"))


@query(
    "nested_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           embedding[1] AS first_elem,
           list_aggregate(embedding, 'max') AS max_elem,
           list_aggregate(embedding, 'min') AS min_elem,
           embedding[1] + embedding[64] AS ends_sum
    FROM embeddings WHERE vec_id < 200
    """,
    tags=("nested", "array"),
)
def nested_array_ops(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.array_max("embedding").alias("max_elem"),
        F.array_min("embedding").alias("min_elem"),
        (F.element_at("embedding", 1) + F.element_at("embedding", 64)).alias("ends_sum"),
    )


@query(
    "nested_lambda_fold",
    oracle="""
    SELECT vec_id,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) * 2.0 AS DECIMAL(20,8)))) AS DOUBLE)
             AS doubled_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings WHERE vec_id < 200
    """,
    tags=("nested", "lambda"),
)
def nested_lambda_fold(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    doubled_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("decimal(30,8)"),
        lambda acc, x: (acc + (x.cast("double") * 2.0).cast("decimal(20,8)")).cast(
            "decimal(30,8)"
        ),
    ).cast("double")
    return e.select(
        "vec_id",
        doubled_sum.alias("doubled_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "nested_array_membership",
    oracle="""
    SELECT doc_id,
           list_contains(string_split(text, ' '), 'hash') AS has_hash,
           CAST(COALESCE(list_position(string_split(text, ' '), 'scan'), 0) AS BIGINT)
             AS scan_pos,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_unique_tokens
    FROM documents WHERE doc_id < 100
    """,
    tags=("nested", "array"),
)
def nested_array_membership(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_contains(toks, "hash").alias("has_hash"),
        F.array_position(toks, "scan").cast("long").alias("scan_pos"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


@query(
    "nested_struct_pack_unpack",
    oracle="""
    SELECT c_custkey,
           struct_pack(key := c_custkey, bal := c_acctbal).key AS packed_key,
           struct_pack(key := c_custkey, bal := c_acctbal).bal AS packed_bal
    FROM customer WHERE c_custkey < 100
    """,
    tags=("nested", "struct"),
)
def nested_struct_pack_unpack(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    packed = F.struct(F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal"))
    return c.select(
        "c_custkey",
        packed.getField("key").alias("packed_key"),
        packed.getField("bal").alias("packed_bal"),
    )


@query(
    "nested_generate_series",
    oracle="""
    SELECT p_partkey, CAST(SUM(s) AS BIGINT) AS series_sum, COUNT(*) AS n_terms
    FROM (
      SELECT p_partkey, unnest(generate_series(1, p_size)) AS s
      FROM part WHERE p_partkey < 20) t
    GROUP BY p_partkey
    """,
    tags=("nested", "table-function"),
)
def nested_generate_series(spark, sf_dir):
    # DataFusion's generate_series table function ≙ Spark sequence()+explode
    # (reference: datafusion/functions-table/src/generate_series.rs).
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 20)
    return (
        p.select("p_partkey", F.explode(F.sequence(F.lit(1), F.col("p_size"))).alias("s"))
        .groupBy("p_partkey")
        .agg(F.sum("s").alias("series_sum"), F.count(F.lit(1)).alias("n_terms"))
    )


@query(
    "nested_array_setops",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ')[1:12] AS ta,
             string_split(text, ' ')[7:20] AS tb
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(len(list_distinct(list_concat(ta, tb))) AS INT) AS n_union,
           CAST(len(list_distinct(list_intersect(ta, tb))) AS INT) AS n_intersect,
           CAST(len(list_filter(list_distinct(ta),
                                x -> NOT list_contains(tb, x))) AS INT) AS n_except,
           array_to_string(list_sort(list_distinct(list_intersect(ta, tb))), ',')
             AS common_sorted,
           CAST(len(flatten([ta, tb])) AS INT) AS n_flat
    FROM t
    """,
    tags=("nested", "array"),
)
def nested_array_setops(spark, sf_dir):
    """array_union/intersect/except + flatten (reference:
    functions-nested/src/set_ops.rs, flatten.rs).  Outputs are scalar
    summaries of the (distinct-semantics) results so the cross-engine hash
    compares values, not array encodings."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    ws = F.split("text", " ")
    d = d.select("doc_id", F.slice(ws, 1, 12).alias("ta"), F.slice(ws, 7, 14).alias("tb"))
    inter = F.array_sort(F.array_intersect("ta", "tb"))
    return d.select(
        "doc_id",
        F.size(F.array_union("ta", "tb")).alias("n_union"),
        F.size(F.array_intersect("ta", "tb")).alias("n_intersect"),
        F.size(F.array_except("ta", "tb")).alias("n_except"),
        F.array_join(inter, ",").alias("common_sorted"),
        F.size(F.flatten(F.array("ta", "tb"))).alias("n_flat"),
    )


@query(
    "nested_map_ops",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')[1:3]) AS ks,
             string_split(text, ' ')[1] AS w1
      FROM documents WHERE doc_id < 200
    ),
    m AS (
      SELECT doc_id, w1, MAP(ks, list_transform(ks, x -> length(x))) AS mp FROM t
    )
    SELECT doc_id,
           CAST(mp[w1][1] AS BIGINT) AS first_word_len,
           CAST(cardinality(mp) AS INT) AS n_keys,
           array_to_string(list_sort(map_keys(mp)), ',') AS keys_sorted,
           CAST(list_sum(map_values(mp)) AS BIGINT) AS vals_sum
    FROM m
    """,
    tags=("nested", "map"),
)
def nested_map_ops(spark, sf_dir):
    """Map type round-trip: build from arrays, key lookup, keys/values
    introspection (reference: functions-nested/src/map.rs, map_keys.rs,
    map_values.rs, map_extract.rs)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    ws = F.split("text", " ")
    d = d.select(
        "doc_id",
        F.array_distinct(F.slice(ws, 1, 3)).alias("ks"),
        F.element_at(ws, 1).alias("w1"),
    )
    m = d.select(
        "doc_id",
        "w1",
        F.map_from_arrays("ks", F.transform("ks", lambda x: F.length(x))).alias("mp"),
    )
    return m.select(
        "doc_id",
        F.element_at("mp", F.col("w1")).cast("long").alias("first_word_len"),
        F.size("mp").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys("mp")), ",").alias("keys_sorted"),
        F.aggregate(
            F.map_values("mp"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("vals_sum"),
    )


@query(
    "nested_array_arithmetic",
    oracle="""
    WITH src AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 120
    ),
    calc AS (
      SELECT vec_id, e,
             list_reduce(e, (acc, x) -> acc + x) AS esum,
             sqrt(list_reduce(list_transform(e, x -> x * x),
                              (acc, x) -> acc + x)) AS enorm
      FROM src
    )
    SELECT vec_id,
           ROUND(esum, 6) AS vec_sum,
           ROUND(esum / len(e), 6) AS vec_avg,
           ROUND(e[1] * e[2] * e[3], 6) AS prod_first3,
           array_to_string(list_transform(
             list_transform(generate_series(1, 4), i -> e[i] + e[len(e) + 1 - i]),
             x -> printf('%.6f', x)), ',') AS head_plus_tail,
           array_to_string(list_transform(
             list_transform(e[1:4], x -> x * 2.5),
             x -> printf('%.6f', x)), ',') AS scaled_head,
           ROUND(list_reduce(list_transform(e, x -> (x / enorm) * (x / enorm)),
                             (acc, x) -> acc + x), 6) AS normalized_l2sq
    FROM calc
    """,
    tags=("nested", "array-arithmetic", "vectors"),
)
def nested_array_arithmetic(spark, sf_dir):
    """Element-wise array arithmetic family (reference: sqllogictest
    array_add/subtract/scale/normalize/sum/avg/product.slt): zip_with
    addition (head + reversed tail), scalar scaling, L2 normalization,
    and whole-array sum/avg/product reductions.  Sums are SEQUENTIAL
    left folds on both engines (§4 rule 3: aggregate() ⇔ list_reduce —
    bit-identical doubles, unlike the engines' parallel list_sum).
    Scale: pure narrow map over the vector column; no shuffle."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 120)
    ed = F.transform("embedding", lambda x: x.cast("double"))
    src = e.select("vec_id", ed.alias("e"))
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
    calc = src.select(
        "vec_id",
        "e",
        fold(F.col("e")).alias("esum"),
        F.sqrt(fold(F.transform("e", lambda x: x * x))).alias("enorm"),
    )
    n = F.size("e")
    stringify = lambda arr: F.array_join(
        F.transform(arr, lambda x: F.format_number(x, 6)), ","
    )
    head_plus_tail = F.transform(
        F.sequence(F.lit(1), F.lit(4)),
        lambda i: F.element_at("e", i) + F.element_at("e", n + 1 - i),
    )
    return calc.select(
        "vec_id",
        F.round("esum", 6).alias("vec_sum"),
        F.round(F.col("esum") / n, 6).alias("vec_avg"),
        F.round(
            F.element_at("e", 1) * F.element_at("e", 2) * F.element_at("e", 3), 6
        ).alias("prod_first3"),
        stringify(head_plus_tail).alias("head_plus_tail"),
        stringify(
            F.transform(F.slice("e", 1, 4), lambda x: x * 2.5)
        ).alias("scaled_head"),
        F.round(
            fold(
                F.transform(
                    "e", lambda x: (x / F.col("enorm")) * (x / F.col("enorm"))
                )
            ),
            6,
        ).alias("normalized_l2sq"),
    )


@query(
    "nested_array_predicates_mutation",
    oracle="""
    WITH src AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE doc_id < 250
    )
    SELECT doc_id,
           len(list_filter(w, t -> LENGTH(t) > 7)) > 0 AS any_long,
           len(list_filter(w, t -> LENGTH(t) > 0)) = len(w) AS all_nonempty,
           array_to_string(list_append(w[1:2], 'EOS'), '|') AS appended,
           array_to_string(list_prepend('BOS', w[1:2]), '|') AS prepended,
           array_to_string(w[1:len(w)-1], '|') AS popped_back,
           CAST(len(w) AS INT) AS cardinality
    FROM src
    """,
    tags=("nested", "array-predicates"),
)
def nested_array_predicates_mutation(spark, sf_dir):
    """Array predicates + mutation family (reference: sqllogictest
    array/{array_any_match,array_all,array_append,array_prepend,
    array_pop,cardinality}.slt): exists/forall higher-order predicates,
    append/prepend, pop-back via slice.  All codegen'd column algebra —
    no shuffle, no UDF."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    w = F.split("text", " ")
    head2 = F.slice(w, 1, 2)
    return d.select(
        "doc_id",
        F.exists(w, lambda t: F.length(t) > 7).alias("any_long"),
        F.forall(w, lambda t: F.length(t) > 0).alias("all_nonempty"),
        F.array_join(F.array_append(head2, F.lit("EOS")), "|").alias("appended"),
        F.array_join(F.array_prepend(head2, F.lit("BOS")), "|").alias("prepended"),
        F.array_join(F.slice(w, 1, F.size(w) - 1), "|").alias("popped_back"),
        F.size(w).alias("cardinality"),
    )


@query(
    "nested_explode_outer",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN []
                    WHEN doc_id % 7 = 0 THEN NULL
                    ELSE string_split(text, ' ')[1:3] END AS arr
        FROM documents
        WHERE doc_id < 40
    )
    SELECT t.doc_id, u.token
    FROM t LEFT JOIN LATERAL unnest(t.arr) AS u(token) ON TRUE
    """,
    tags=("nested", "unnest", "outer"),
)
def nested_explode_outer(spark, sf_dir):
    """explode_outer / OUTER unnest: rows whose array is empty or NULL
    survive with a NULL element (reference: physical-plan unnest.rs
    ``preserve_nulls`` and sqllogictest unnest.slt outer cases).  Plain
    explode would drop those rows; the outer variant is the semantics
    DataFusion's UNNEST ... PRESERVE NULLS implements.  Runs inside
    whole-stage codegen as a generator — no shuffle, output partitioning
    inherits the scan."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    arr = (
        F.when(F.col("doc_id") % 5 == 0, F.array().cast("array<string>"))
        .when(F.col("doc_id") % 7 == 0, F.lit(None).cast("array<string>"))
        .otherwise(F.slice(F.split("text", " "), 1, 3))
    )
    return d.select("doc_id", F.explode_outer(arr).alias("token"))


@query(
    "nested_map_construction",
    oracle="""
    SELECT p_partkey,
           p_brand AS brand_from_str_map,
           CAST(p_size AS VARCHAR) AS size_from_arrays_map,
           p_retailprice AS price_from_entries_map,
           CAST(NULL AS VARCHAR) AS missing_key
    FROM part
    WHERE p_partkey < 2000
    """,
    tags=("nested", "map", "spark-compat"),
)
def nested_map_construction(spark, sf_dir):
    """Map constructors (reference: test_files/spark/map/
    {map_from_arrays,map_from_entries,str_to_map}.slt).  Each map is
    built from base columns a different way, then a lookup must
    round-trip the original value — the oracle simply reads the base
    columns, so any construction/lookup defect breaks the hash.
    Missing-key lookup yields NULL (tested explicitly).  All three are
    JVM-side expressions inside codegen — no shuffle, no UDF."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 2000)
    str_map = F.expr("str_to_map(concat('brand:', p_brand, ',type:', p_type), ',', ':')")
    arr_map = F.map_from_arrays(
        F.array(F.lit("size"), F.lit("container")),
        F.array(F.col("p_size").cast("string"), F.col("p_name")),
    )
    ent_map = F.map_from_entries(
        F.array(F.struct(F.lit("rp").alias("k"), F.col("p_retailprice").alias("v")))
    )
    return p.select(
        "p_partkey",
        str_map.getItem("brand").alias("brand_from_str_map"),
        arr_map.getItem("size").alias("size_from_arrays_map"),
        ent_map.getItem("rp").alias("price_from_entries_map"),
        str_map.getItem("absent").alias("missing_key"),
    )


@query(
    "nested_vector_elementwise",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id < 50
    )
    SELECT vec_id,
           ROUND(list_transform(list_zip(v, v), p -> p[1] + p[2])[1], 6)  AS add_head,
           list_sum(list_transform(list_zip(v, v), p -> abs(p[1] - p[2]))) = 0 AS sub_self_is_zero,
           ROUND(list_transform(v, x -> x * 2.5)[1], 6)                  AS scale_head,
           ROUND(list_avg(v), 6)                                         AS avg_elements,
           -- + 0.0 normalizes a rounded -0.0 (negative product rounding
           -- to zero keeps its sign in DuckDB, not in Spark; hash-breaking)
           ROUND(list_aggregate(v[1:4], 'product'), 6) + CAST(0.0 AS DOUBLE) AS product_head4,
           ROUND(list_filter(v, x -> x > 0)[1], 6)                       AS first_positive,
           CAST(len(list_concat(v, [0.25, 0.25, 0.25, 0.25, 0.25, 0.25])) AS INTEGER) AS resized_len,
           ROUND(list_concat(v, [0.25, 0.25, 0.25, 0.25, 0.25, 0.25])[70], 6) AS resized_fill
    FROM e ORDER BY vec_id
    """,
    tags=("nested", "vector", "elementwise"),
)
def nested_vector_elementwise(spark, sf_dir):
    """Element-wise vector algebra over real embedding arrays — the
    functions-nested vector family (reference functions-nested/src/
    array_add.rs, array_subtract.rs, array_scale.rs, array_avg.rs,
    array_product.rs, array_first.rs, array_filter.rs, resize.rs)
    composed from Spark's higher-order array functions: zip_with for the
    element-wise add/subtract (per-position NULL propagation for free),
    transform for scalar scale, NULL-skipping aggregate for avg, a
    multiplicative fold for product, filter+head for first-match, and
    slice/concat/array_repeat for resize-with-fill (the oracle spells the
    fill with list_concat: this DuckDB build's list_resize crashes on
    parquet-scanned DOUBLE[] inputs)."""
    from datafusion_spark.catalog import load_table

    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )
    add = F.zip_with("v", "v", lambda x, y: x + y)
    sub_abs = F.zip_with("v", "v", lambda x, y: F.abs(x - y))
    fold_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    nn = F.filter("v", lambda x: x.isNotNull())
    avg = F.when(
        F.size(nn) > 0, fold_sum(nn) / F.size(nn)
    )
    product4 = F.aggregate(F.slice("v", 1, 4), F.lit(1.0), lambda a, x: a * x)
    resized = F.concat(F.slice("v", 1, 70), F.array_repeat(F.lit(0.25), 70 - 64))
    return e.select(
        "vec_id",
        F.round(F.element_at(add, 1), 6).alias("add_head"),
        (fold_sum(sub_abs) == 0).alias("sub_self_is_zero"),
        F.round(F.element_at(F.transform("v", lambda x: x * 2.5), 1), 6).alias("scale_head"),
        F.round(avg, 6).alias("avg_elements"),
        (F.round(product4, 6) + F.lit(0.0)).alias("product_head4"),
        F.round(F.element_at(F.filter("v", lambda x: x > 0), 1), 6).alias("first_positive"),
        F.size(resized).alias("resized_len"),
        F.round(F.element_at(resized, 70), 6).alias("resized_fill"),
    ).orderBy("vec_id")


@query(
    "join_array_keys",
    oracle="""
    WITH pa AS (
        SELECT p_partkey,
               list_value(p_size % 7, CAST(p_partkey % 5 AS INT)) AS arr
        FROM part
    ),
    d AS (SELECT arr, CAST(COUNT(*) AS BIGINT) AS n FROM pa GROUP BY arr)
    SELECT pa.p_partkey, d.n
    FROM pa JOIN d USING (arr)
    WHERE pa.p_partkey < 200
    ORDER BY pa.p_partkey
    """,
    tags=("join", "nested", "edge"),
)
def join_array_keys(spark, sf_dir):
    """Array-typed equi-join and group keys (reference join_lists.slt,
    array_query.slt: lists compare element-wise, so they work as join and
    grouping keys).  A derived array column is grouped (array GROUP BY →
    hash partitioning on the array value) and joined back to its source
    (array equi-join); both engines treat []=[] and element-wise equality
    identically.  At scale this is the shape of joining on tokenized
    composite keys without string-concatenation hacks — Spark hash-
    partitions array values natively, no shuffle-key serialization
    tricks."""
    part = load_table(spark, sf_dir, "part")
    pa = part.select(
        "p_partkey",
        F.array(
            (F.col("p_size") % 7).cast("int"),
            (F.col("p_partkey") % 5).cast("int"),
        ).alias("arr"),
    )
    d = pa.groupBy("arr").agg(F.count(F.lit(1)).alias("n"))
    return (
        pa.join(d, "arr")
        .filter(F.col("p_partkey") < 200)
        .select("p_partkey", "n")
        .orderBy("p_partkey")
    )


@query(
    "nested_unnest_filter_pushdown",
    oracle="""
    SELECT token, p_size
    FROM (SELECT unnest(string_split(p_name, ' ')) AS token, p_size
          FROM part) t
    WHERE p_size = 5 AND token >= 'p'
    ORDER BY token, p_size
    LIMIT 500
    """,
    tags=("nested", "pushdown"),
)
def nested_unnest_filter_pushdown(spark, sf_dir):
    """Mirror of sqllogictest push_down_filter_unnest.slt: a predicate
    on a NON-unnested column must evaluate BELOW the unnest (the
    reference plans FilterExec under UnnestExec for column1 = 2), while
    a predicate on the unnested output stays above it.  Spark's
    Generate behaves the same: the p_size filter reaches the parquet
    scan (PushedFilters pin in test_plan_budgets) so only matching rows
    are exploded — at corpus scale the difference is exploding 1/50th
    of the table vs all of it — and the token filter runs post-Generate
    because it can't exist earlier."""
    p = _t(spark, sf_dir, "part")
    exploded = (
        p.select(F.explode(F.split(F.col("p_name"), " ")).alias("token"),
                 "p_size")
    )
    return (
        exploded.filter((F.col("p_size") == 5) & (F.col("token") >= "p"))
        .orderBy("token", "p_size")
        .limit(500)
    )
