"""ANN recall report: measure recall@k of the IVF search paths against
the brute-force baseline.

The accuracy/latency knob of an IVF index is nprobe; this prints the
measured recall@5 of nprobe=1 and nprobe=4 against the exact cosine
top-5, plus candidate-set sizes (the cost proxy: candidates scored per
query vs full corpus).  Exits non-zero if the multiprobe path falls
below the acceptance floor (recall@5 >= 0.8) — the gate that keeps the
IVF index honest rather than decorative.  Run:

    python tools/recall_report.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_spark.queries import QUERIES  # noqa: E402
from datafusion_spark.session import get_spark  # noqa: E402

RECALL_FLOOR = 0.8


def _topk_sets(df, k=5):
    rows = df.collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.qid, set()).add(r.vec_id)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    args = ap.parse_args()
    spark = get_spark("recall_report")

    exact = _topk_sets(
        QUERIES["similarity_cosine_topk"](spark, args.sf).filter(F.col("cos_sim").isNotNull())
    )
    # brute force returns top-10; trim to 5 via re-rank client-side
    exact5 = {
        q: set(
            v
            for v, _ in sorted(
                [
                    (r.vec_id, -r.cos_sim)
                    for r in QUERIES["similarity_cosine_topk"](spark, args.sf)
                    .filter(F.col("qid") == q)
                    .collect()
                ],
                key=lambda t: (t[1], t[0]),
            )[:5]
        )
        for q in exact
    }

    report = {"sf": args.sf, "k": 5, "paths": {}}
    n_corpus = QUERIES["similarity_ivf_assign"](spark, args.sf).count()
    for name in ["similarity_ivf_topk", "similarity_ivf_topk_multiprobe"]:
        got = _topk_sets(QUERIES[name](spark, args.sf))
        recalls = [
            len(got.get(q, set()) & exact5[q]) / max(1, len(exact5[q])) for q in exact5
        ]
        report["paths"][name] = {
            "recall_at_5": round(sum(recalls) / len(recalls), 4),
            "n_queries": len(recalls),
        }
    report["corpus_size"] = n_corpus

    # PQ family: L2/ADC paths, measured against the exact-L2 top-5 (the
    # metric those entries rank by).  Floors are broken-path guards, not
    # tuning targets.  With the M=16/D=4/K=64/3-round config the measured
    # recall@5 on this near-uniform corpus is ~0.64 (pq), ~0.52 (ivfpq),
    # ~0.38 (residual ivfpq — additionally bounded by the coarse probe's
    # candidate pruning); chance is ~0.01.  The old M=8/D=8 config capped
    # at ~0.36 no matter the codebook size or Lloyd rounds — per-subspace
    # distortion scales as K^(-2/D), an information-theoretic property of
    # the subspace width, which is why the config halves D instead of
    # raising K (see pipeline_similarity.py PQ header).
    from pyspark.sql import Window

    from datafusion_spark.catalog import load_table

    emb = load_table(spark, args.sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    d = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("qid").orderBy(F.col("d").asc(), "vec_id")
    exact_l2: dict[int, set[int]] = {}
    for r in (
        q.crossJoin(emb)
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("d", d)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 5")
        .collect()
    ):
        exact_l2.setdefault(r.qid, set()).add(r.vec_id)
    PQ_FLOOR = 0.3  # guards the ~0.64/0.52/0.38 measured levels
    # the exact-re-rank path removes quantization distortion from the final
    # ranking, so it is held to the IVF probe ceiling, not the ADC floor
    RERANK_FLOOR = 0.8
    pq_ok = True
    for name, floor in [
        ("similarity_pq_topk", PQ_FLOOR),
        ("similarity_ivfpq_topk", PQ_FLOOR),
        ("similarity_ivfpq_residual_topk", PQ_FLOOR),
        ("similarity_ivfpq_rerank_topk", RERANK_FLOOR),
    ]:
        got: dict[int, set[int]] = {}
        for r in QUERIES[name](spark, args.sf).collect():
            got.setdefault(r.qid, set()).add(r.neighbor_id)
        rc = sum(len(got.get(k, set()) & exact_l2[k]) for k in exact_l2) / (
            5 * len(exact_l2)
        )
        report["paths"][name] = {
            "recall_at_5": round(rc, 4),
            "n_queries": len(exact_l2),
            "baseline": "exact-l2",
            "floor": floor,
        }
        pq_ok = pq_ok and rc >= floor

    # FILTERED ANN: baseline is the filtered brute force (exact cosine
    # top-5 restricted to the query's label) — recall measures only what
    # the IVF probe loses, not what the filter removes.  Probed cells
    # post-filter on label, so the floor matches the multiprobe family.
    emb_l = load_table(spark, args.sf, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    ql = emb_l.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("q_label"),
        F.col("e").alias("qe"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    nq = F.sqrt(F.aggregate(
        F.transform(F.col("qe"), lambda x: x * x),
        F.lit(0.0), lambda acc, v: acc + v))
    nc = F.sqrt(F.aggregate(
        F.transform(F.col("e"), lambda x: x * x),
        F.lit(0.0), lambda acc, v: acc + v))
    wf = Window.partitionBy("qid").orderBy(
        (dot / (nq * nc)).desc(), F.col("vec_id"))
    exact_filtered: dict[int, set[int]] = {}
    for r in (
        ql.crossJoin(emb_l)
        .filter((F.col("vec_id") != F.col("qid"))
                & (F.col("label") == F.col("q_label")))
        .withColumn("rn", F.row_number().over(wf))
        .filter("rn <= 5")
        .collect()
    ):
        exact_filtered.setdefault(r.qid, set()).add(r.vec_id)
    gotf: dict[int, set[int]] = {}
    for r in QUERIES["similarity_ivf_filtered_topk"](spark, args.sf).collect():
        gotf.setdefault(r.qid, set()).add(r.vec_id)
    rcf = sum(
        len(gotf.get(k, set()) & exact_filtered[k]) / max(1, len(exact_filtered[k]))
        for k in exact_filtered
    ) / max(1, len(exact_filtered))
    # floor 0.7: a broken-path guard below the measured 0.80 level (the
    # filtered candidate stream is label-thinned, so the probe ceiling
    # sits slightly under the unfiltered multiprobe's) — rounded compare
    # so an exactly-at-floor mean of x/5 fractions can't float-dust a FAIL
    FILTERED_FLOOR = 0.7
    rcf = round(rcf, 4)
    report["paths"]["similarity_ivf_filtered_topk"] = {
        "recall_at_5": rcf,
        "n_queries": len(exact_filtered),
        "baseline": "exact-cosine-filtered",
        "floor": FILTERED_FLOOR,
    }

    mp = report["paths"]["similarity_ivf_topk_multiprobe"]["recall_at_5"]
    report["floor"] = RECALL_FLOOR
    report["pass"] = mp >= RECALL_FLOOR and pq_ok and rcf >= FILTERED_FLOOR
    print(json.dumps(report))
    spark.stop()
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
