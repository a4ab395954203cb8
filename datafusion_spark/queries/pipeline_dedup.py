"""Deduplication operators for training-data pipelines.

Five dedup families over the `documents` / `embeddings` tables:
  exact (content hash), normalized-exact, MinHash+LSH banding,
  SimHash (bit-majority fingerprint) + hamming pairs, n-gram Jaccard.

Every hash is derived from md5 so Spark and DuckDB agree bit-for-bit —
engine-native hash() functions differ, md5 doesn't.  MinHash signatures
are string-mins of salted md5s; SimHash bits test a hex nibble's top bit
("digit >= '8'", valid because hex chars sort 0-9a-f in ASCII).

Scale design (the point of these operators):
  - exact dedup: one hash-shuffle on the digest, min() combiner is
    map-side partial — no document text travels beyond its digest+id.
  - MinHash: signatures reduce each doc to k strings in ONE aggregation
    pass (k min() aggs, no row explosion); LSH banding turns the O(n²)
    pair search into an equi-join on band keys — the only join is between
    docs that already collide.  At 100 TB, band keys are high-cardinality
    → well-distributed shuffle; skewed bands (boilerplate docs) are the
    known hot spot and AQE skew-join splits them.
  - SimHash pairs: banded by the top byte so the self-join never goes
    quadratic; hamming distance is a cheap bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.queries.helpers import fan_out
from datafusion_spark.queries.registry import query

K_MINHASH = 8  # signature length; banded 4 x 2 below

# Pathological-bucket cap for LSH banding: near-universal signatures
# (boilerplate, empty/templated docs) make some band buckets enormous at
# corpus scale, and an un-capped collect_list + quadratic pair expand is
# a single-task OOM at 100 TB.  Buckets beyond the cap keep only their
# first CAP (sorted) members — content that collides that broadly is
# boilerplate to drop, not to pair exhaustively.  The cap sits far above
# any bucket reachable at oracle scale factors (measured max 15 at sf1),
# so driver/oracle semantics are unchanged; a production corpus would
# tune this down (e.g. 64) and route dropped buckets to review.
LSH_BUCKET_CAP = 1024
SHINGLE = 3  # word n-gram size


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- exact dedup -----------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents
    )
    SELECT MD5(text) AS content_hash,
           MIN(doc_id) AS kept_doc_id,
           COUNT(*) AS n_copies
    FROM corpus
    GROUP BY MD5(text)
    """,
    tags=("pipeline", "dedup", "bench"),
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash over a corpus with known duplicates
    (the table unioned with a re-keyed copy of itself): keep min doc_id.
    At scale: shuffle carries (digest, id) only — ~48 bytes/doc."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copy = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    corpus = docs.unionByName(copy)
    return (
        corpus.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "dedup_exact_normalized",
    oracle="""
    SELECT MD5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS norm_hash,
           MIN(doc_id) AS kept_doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY norm_hash
    """,
    tags=("pipeline", "dedup"),
)
def dedup_exact_normalized(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
    return (
        docs.select(F.md5(norm).alias("norm_hash"), "doc_id")
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --- MinHash + LSH -----------------------------------------------------------

_SQL_SHINGLES = f"""
    words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      FROM words, unnest(generate_series(1, len(ws) - {SHINGLE - 1})) AS t(i)
      WHERE len(ws) >= {SHINGLE}
    )
"""


def _shingles(docs: DataFrame, distinct: bool = True) -> DataFrame:
    """doc_id, sh: word 3-grams (distinct by default).  transform+slice
    stays JVM-side.  MinHash callers pass distinct=False — min() is
    unaffected by duplicate shingles, and skipping distinct removes a full
    shuffle of the widest intermediate (every shingle string)."""
    ws = F.split("text", " ")
    out = (
        fan_out(docs).filter(F.size(ws) >= SHINGLE)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - (SHINGLE - 1)),
                    lambda i: F.array_join(F.slice(ws, i, SHINGLE), " "),
                )
            ).alias("sh"),
        )
    )
    return out.distinct() if distinct else out


# 8 hash functions from 2 md5 digests: concat(md5(sh), md5(sh||'#')) is 64
# hex chars; slice i*8+1..+8 is an independent 32-bit hash. Halves the
# dominant cost (md5 per shingle) 4x vs salting md5 once per function.
_H64 = 'MD5(sh) || MD5(sh || \'#\')'


def _minhash_cols() -> list[Column]:
    h64 = F.concat(F.md5("sh"), F.md5(F.concat(F.col("sh"), F.lit("#"))))
    return [
        F.min(F.substring(h64, i * 8 + 1, 8)).alias(f"m{i}") for i in range(K_MINHASH)
    ]


@query(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH {_SQL_SHINGLES}
    SELECT doc_id,
           {", ".join(f"MIN(SUBSTR(MD5(sh) || MD5(sh || '#'), {i * 8 + 1}, 8)) AS m{i}" for i in range(K_MINHASH))}
    FROM shingles
    GROUP BY doc_id
    """,
    tags=("pipeline", "dedup", "minhash"),
)
def dedup_minhash_signatures(spark, sf_dir):
    """k=8 MinHash signature per doc in one aggregation pass (k min()
    combiners, map-side partial — no shingle explosion beyond the per-doc
    distinct)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return _shingles(docs, distinct=False).groupBy("doc_id").agg(*_minhash_cols())


@query(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    sigs AS (
      SELECT doc_id,
             {", ".join(f"MIN(SUBSTR(MD5(sh) || MD5(sh || '#'), {i * 8 + 1}, 8)) AS m{i}" for i in range(K_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, b.band_id, b.band_key
      FROM sigs, LATERAL (VALUES
        (0, m0 || m1), (1, m2 || m3), (2, m4 || m5), (3, m6 || m7)
      ) AS b(band_id, band_key)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    """,
    tags=("pipeline", "dedup", "minhash", "bench"),
)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    """LSH banding (4 bands x 2 rows): candidate pairs are produced per
    band BUCKET — never an n² comparison.  P(candidate | J=s) = 1-(1-s²)⁴.

    Plan shape: instead of a bands self-join (which evaluates the whole
    shingle→md5→signature pipeline twice — two corpus scans at 100 TB,
    Catalyst does not reuse the exchange across the self-join sides), the
    bucket members are collected per (band_id, band_key) and the i<j pairs
    expand from the sorted list — ONE signature pass, one shuffle fewer,
    identical result set (the oracle keeps the self-join formulation).
    Bucket lists are bounded by band-key collision counts (max 15 on this
    corpus at sf1); pathological buckets (near-universal signatures) are
    capped at LSH_BUCKET_CAP members before the quadratic expand, and the
    number of truncated buckets is surfaced as an observed metric
    (`dedup_lsh_buckets.truncated_buckets`) so a production run sees the
    drop without an extra corpus pass."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = _shingles(docs, distinct=False).groupBy("doc_id").agg(*_minhash_cols())
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat(F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}")).alias("band_key"),
            )
            for b in range(K_MINHASH // 2)
        ]
    )
    bands = sigs.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", F.col("b.band_id").alias("band_id"), F.col("b.band_key").alias("band_key")
    )
    buckets = (
        bands.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
        .observe(
            "dedup_lsh_buckets",
            F.sum(F.when(F.size("ds") > LSH_BUCKET_CAP, 1).otherwise(0)).alias(
                "truncated_buckets"
            ),
            F.max(F.size("ds")).alias("max_bucket_size"),
        )
        .withColumn("ds", F.slice("ds", 1, LSH_BUCKET_CAP))
    )
    return (
        buckets.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(ds, (x, i) -> transform("
                        "slice(ds, i + 2, size(ds) - i - 1), "
                        "y -> struct(x AS doc_a, y AS doc_b)))"
                    )
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


# --- SimHash ---------------------------------------------------------------


def _hex_bit(md5_col: Column, j: int) -> Column:
    """+1 / -1 weight from the top bit of md5 hex digit j (1-based)."""
    return F.when(F.substring(md5_col, j, 1) >= "8", 1).otherwise(-1)


@query(
    "dedup_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id, MD5(unnest(string_split(text, ' '))) AS h FROM documents
    ),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id, CAST({sim} AS BIGINT) AS simhash16 FROM sums
    """.format(
        sums=", ".join(
            f"SUM(CASE WHEN substr(h, {j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s{j}"
            for j in range(16)
        ),
        sim=" + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16)),
    ),
    tags=("pipeline", "dedup", "simhash"),
)
def dedup_simhash(spark, sf_dir):
    """16-bit SimHash: token-frequency-weighted bit majority.  One explode +
    one aggregation — the sums are map-side partial, so at scale the
    shuffle carries 16 ints per doc."""
    docs = fan_out(_t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).select(
        "doc_id", F.md5("tok").alias("h")
    )
    sums = toks.groupBy("doc_id").agg(
        *[F.sum(_hex_bit(F.col("h"), j + 1)).alias(f"s{j}") for j in range(16)]
    )
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return sums.select("doc_id", sim.cast("long").alias("simhash16"))


@query(
    "dedup_simhash_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, MD5(unnest(string_split(text, ' '))) AS h FROM documents
    ),
    sums AS (
      SELECT doc_id, {sums} FROM toks GROUP BY doc_id
    ),
    sigs AS (
      SELECT doc_id, CAST({sim} AS BIGINT) AS sig FROM sums
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b
      ON (a.sig >> 8) = (b.sig >> 8) AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 2
    """.format(
        sums=", ".join(
            f"SUM(CASE WHEN substr(h, {j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s{j}"
            for j in range(16)
        ),
        sim=" + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16)),
    ),
    tags=("pipeline", "dedup", "simhash"),
)
def dedup_simhash_pairs(spark, sf_dir):
    """Near-dup pairs: hamming(simhash) <= 2, candidate-limited by equal
    top byte (prefix banding) so the self-join stays near-linear."""
    sigs = dedup_simhash(spark, sf_dir).withColumnRenamed("simhash16", "sig")
    a, b = sigs.alias("a"), sigs.alias("b")
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.shiftright(F.col("a.sig"), 8) == F.shiftright(F.col("b.sig"), 8))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= 2)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),
        )
    )


# --- n-gram Jaccard ----------------------------------------------------------


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id
    ),
    meta AS (
      SELECT s.doc_id, s.sh, d.lang, d.source
      FROM shingles s JOIN documents d USING (doc_id)
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM meta a JOIN meta b
        ON a.sh = b.sh AND a.lang = b.lang AND a.source = b.source
       AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.05
    """,
    tags=("pipeline", "dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard for pairs sharing at least one shingle within
    the same (lang, source) stratum — the shared-shingle equi-join bounds
    candidates; strata keep the hot shingles from going quadratic."""
    docs = _t(spark, sf_dir, "documents")
    sh = _shingles(docs.select("doc_id", "text"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    meta = sh.join(docs.select("doc_id", "lang", "source"), "doc_id")
    a, b = meta.alias("a"), meta.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.05)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --- near-dup clustering (connected components over LSH pairs) --------------


# Shared oracle prefix: shingles → minhash sigs → LSH bands → candidate
# pairs → undirected edges → recursive label-propagation walk → components.
_SQL_COMPONENTS = f"""
    WITH RECURSIVE {_SQL_SHINGLES},
    sigs AS (
      SELECT doc_id,
             {", ".join(f"MIN(SUBSTR(MD5(sh) || MD5(sh || '#'), {i * 8 + 1}, 8)) AS m{i}" for i in range(K_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, b.band_id, b.band_key
      FROM sigs, LATERAL (VALUES
        (0, m0 || m1), (1, m2 || m3), (2, m4 || m5), (3, m6 || m7)
      ) AS b(band_id, band_key)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    walk(doc, label) AS (
      SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
      UNION
      SELECT e.d, w.label FROM edges e JOIN walk w ON e.s = w.doc
    ),
    comp AS (
      SELECT doc, MIN(label) AS component_id FROM walk GROUP BY doc
    )
"""


# Components are consumed by two registry entries (clusters + canonical
# apply); the fixpoint is the most expensive dedup stage, so persist its
# result once per (session, sf_dir) instead of re-running the whole label
# propagation per entry.
_COMPONENT_CACHE: dict[tuple[str, str], DataFrame] = {}


def _near_dup_components(spark, sf_dir) -> DataFrame:
    """(doc, component_id) for every doc that has at least one near-dup
    edge; component_id := min doc_id in the component (label propagation
    to distinct-fixpoint, operators/recursive.py)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _COMPONENT_CACHE.get(key)
    if cached is not None:
        return cached
    comp = _near_dup_components_uncached(spark, sf_dir).persist()
    _COMPONENT_CACHE[key] = comp
    return comp


def _near_dup_components_uncached(spark, sf_dir) -> DataFrame:
    from datafusion_spark.operators.recursive import recursive_fixpoint_distinct

    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d")).unionAll(
        pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
    )
    base = edges.select(F.col("s").alias("doc")).distinct().select(
        "doc", F.col("doc").alias("label")
    )

    def step(frontier):
        f = frontier.select(F.col("doc").alias("src"), "label")
        return edges.join(f, edges.s == F.col("src")).select(
            F.col("d").alias("doc"), "label"
        )

    walk = recursive_fixpoint_distinct(base, step, max_iter=24)
    return walk.groupBy("doc").agg(F.min("label").alias("component_id"))


@query(
    "dedup_connected_components",
    oracle=f"""
    {_SQL_COMPONENTS}
    SELECT component_id, COUNT(*) AS n_docs,
           string_agg(doc, ',' ORDER BY doc) AS docs_csv
    FROM comp GROUP BY component_id
    """,
    tags=("pipeline", "dedup", "graph"),
)
def dedup_connected_components(spark, sf_dir):
    """Near-duplicate CLUSTERS: connected components over the LSH candidate
    pair graph, via distinct-fixpoint label propagation (operators/
    recursive.py) — the step every real dedup pipeline needs after pair
    generation (keep one doc per component, not per pair).  The oracle is
    DuckDB's native recursive UNION walk, so the loop is checked against
    true recursive-query semantics.

    Scale: iterations = graph diameter (dup clusters are shallow — mostly
    2-5 docs); each round is one frontier⋈edges join + anti-join dedup,
    all shuffles on doc_id.  Component id := min doc_id in the component.
    """
    comp = _near_dup_components(spark, sf_dir)
    return comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(F.array_sort(F.collect_list("doc")), ",").alias("docs_csv"),
    )

@query(
    "dedup_apply_canonical",
    oracle=f"""
    {_SQL_COMPONENTS}
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (
      SELECT doc FROM comp WHERE doc != component_id)
    """,
    tags=("pipeline", "dedup", "apply"),
)
def dedup_apply_canonical(spark, sf_dir):
    """END-TO-END near-dup dedup: the surviving corpus.  Keep the minimum
    doc_id of every LSH/connected-component cluster, drop the rest — an
    anti-join of documents against the non-canonical member set.  This is
    the operator a training-data pipeline actually runs (pairs and
    clusters are intermediates).

    Scale: non-canonical members are a small fraction of the corpus, so
    the anti-join broadcasts them; documents itself is never shuffled."""
    comp = _near_dup_components(spark, sf_dir)
    non_canonical = comp.filter(F.col("doc") != F.col("component_id")).select(
        F.col("doc").alias("doc_id")
    )
    docs = load_table(spark, sf_dir, "documents")
    return docs.join(F.broadcast(non_canonical), "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


@query(
    "dedup_substring_windows",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), wins AS (
      SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS h
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g
      WHERE len(t) >= 8
    ), shared AS (
      SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2
    ), tot AS (
      SELECT doc_id, COUNT(*) AS total_windows FROM wins GROUP BY doc_id
    ), sh AS (
      SELECT w.doc_id, COUNT(*) AS shared_windows
      FROM wins w JOIN shared s USING (h) GROUP BY w.doc_id
    )
    SELECT t.doc_id,
           CAST(t.total_windows AS BIGINT)            AS total_windows,
           CAST(COALESCE(sh.shared_windows, 0) AS BIGINT) AS shared_windows,
           ROUND(CAST(COALESCE(sh.shared_windows, 0) AS DOUBLE)
                 / t.total_windows, 6)                AS dup_frac
    FROM tot t LEFT JOIN sh USING (doc_id) ORDER BY t.doc_id
    """,
    tags=("pipeline", "dedup", "substring", "bench"),
)
def dedup_substring_windows(spark, sf_dir):
    """Substring-level duplication detection (the training-data step doc-
    level dedup misses: boilerplate / quoted passages repeated ACROSS
    otherwise-distinct documents).  Every 8-token rolling window is
    hashed; windows seen in ≥2 documents are "shared", and each document
    reports its shared-window fraction — the score a pipeline thresholds
    to strip repeated passages.

    Scale shape (the suffix-array alternative's distributed stand-in):
    explode is a narrow map (rows × ~tokens, no shuffle); the only
    shuffle keys are uniform MD5 window hashes, so no skew; the shared
    set is h-only and joins back hash-to-hash.  Window count is linear
    in corpus tokens — at 100 TB this is the standard hash-window pass
    (Lee et al. dedup), sharded by hash range, never all-pairs."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")) \
               .filter(F.size("t") >= 8)
    # Per-doc window dedup happens ROW-LOCALLY via array_distinct (r12,
    # guide §2.4): the old `.distinct()` shuffled every raw (doc_id, h)
    # pair once just to dedup within documents — the per-doc distinct is
    # a narrow array op, so that whole exchange disappears (interleaved
    # A/B at sf0.1: 1.57s → 1.23s, rows identical).
    wins = toks.select(
        "doc_id",
        F.explode(F.expr(
            "array_distinct(transform(sequence(1, size(t) - 7),"
            " i -> md5(array_join(slice(t, i, 8), ' '))))")).alias("h"),
    )
    # Single pass over the distinct windows: Catalyst does NOT reuse the
    # explode+md5 subtree across self-join sides (the naive
    # shared/tot/sh formulation scanned and hashed the corpus three
    # times), so the per-hash doc count rides a window over the h
    # partitioning and both per-doc counters come out of ONE doc_id
    # aggregation — one corpus scan, two keyed shuffles total
    # (a groupBy(h)+collect_list alternative re-measured slower: the
    # object-hash list agg costs more than the window's sort).
    nd = F.count(F.lit(1)).over(Window.partitionBy("h"))
    per_doc = (
        wins.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_windows"),
            F.count(F.when(F.col("nd") >= 2, 1)).alias("shared_windows"),
        )
    )
    return per_doc.select(
        "doc_id",
        "total_windows",
        "shared_windows",
        F.round(F.col("shared_windows").cast("double")
                / F.col("total_windows"), 6).alias("dup_frac"),
    )


@query(
    "dedup_incremental_lsh",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    sigs AS (
      SELECT doc_id,
             {", ".join(f"MIN(SUBSTR(MD5(sh) || MD5(sh || '#'), {i * 8 + 1}, 8)) AS m{i}" for i in range(K_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, b.band_id, b.band_key
      FROM sigs, LATERAL (VALUES
        (0, m0 || m1), (1, m2 || m3), (2, m4 || m5), (3, m6 || m7)
      ) AS b(band_id, band_key)
    )
    SELECT DISTINCT n.doc_id AS new_doc, h.doc_id AS hist_doc
    FROM (SELECT * FROM bands WHERE doc_id % 10 >= 8) n
    JOIN (SELECT * FROM bands WHERE doc_id % 10 < 8) h
      ON n.band_id = h.band_id AND n.band_key = h.band_key
    """,
    tags=("pipeline", "dedup", "minhash", "incremental"),
)
def dedup_incremental_lsh(spark, sf_dir):
    """Incremental near-dup screening: a NEW ingest batch (doc_id%10 >= 8,
    ~20% of the corpus) is checked against the HISTORICAL corpus
    (doc_id%10 < 8) through the same 4-band MinHash LSH index — the shape
    of every production 100 TB pipeline, where data arrives in batches
    and each batch must be deduped against everything already accepted
    WITHOUT re-pairing history against itself.

    Plan shape (single-pass, like dedup_minhash_lsh_pairs): ONE signature
    pass over the corpus — a bands self-join would evaluate the whole
    shingle→md5→signature pipeline twice, two corpus scans at 100 TB —
    then one shuffle onto (band_id, band_key) collecting the bucket's new
    and history members into two SEPARATE capped lists (collect_list
    skips the CASE-null side), and the (new × hist) candidates expand
    inside each bucket: no history self-pairs ever materialize.  In a
    real deployment the history side is the persisted band index (cf. the
    PQ code artifact in pipeline_similarity) and only the batch is
    scanned; pathological buckets are capped at LSH_BUCKET_CAP per side
    before the expand, same policy and metric as the full-corpus entry."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = _shingles(docs, distinct=False).groupBy("doc_id").agg(*_minhash_cols())
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat(F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}")).alias("band_key"),
            )
            for b in range(K_MINHASH // 2)
        ]
    )
    bands = sigs.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id",
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_key").alias("band_key"),
    )
    is_new = F.col("doc_id") % 10 >= 8
    buckets = (
        bands.groupBy("band_id", "band_key")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.when(is_new, F.col("doc_id")))),
                1, LSH_BUCKET_CAP,
            ).alias("new_ds"),
            F.slice(
                F.sort_array(F.collect_list(F.when(~is_new, F.col("doc_id")))),
                1, LSH_BUCKET_CAP,
            ).alias("hist_ds"),
        )
        .filter((F.size("new_ds") > 0) & (F.size("hist_ds") > 0))
    )
    return (
        buckets.select(
            F.explode("new_ds").alias("new_doc"), "hist_ds"
        )
        .select("new_doc", F.explode("hist_ds").alias("hist_doc"))
        .distinct()
    )
