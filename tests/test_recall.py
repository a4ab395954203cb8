"""ANN recall acceptance gate (VERDICT r1 item 2).

The IVF index must be a usable ANN substitute, not just a correct plan
shape: multiprobe recall@5 vs the brute-force cosine baseline must clear
0.8.  Uses the learned k-means quantizer (k=8, nprobe=4) — per-label
centroids measured 0.16 in round 1.
"""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.qid, set()).add(r.vec_id)
    return out


def test_ivf_multiprobe_recall_floor(spark):
    from pyspark.sql import functions as F

    from datafusion_spark.queries import QUERIES

    exact = QUERIES["similarity_cosine_topk"](spark, SF_ORACLE)
    w_rn = exact.withColumn(
        "rn5",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("qid")
            .orderBy(F.col("cos_sim").desc(), "vec_id")
        ),
    ).filter(F.col("rn5") <= 5)
    exact5 = _topk_sets(w_rn)
    got = _topk_sets(QUERIES["similarity_ivf_topk_multiprobe"](spark, SF_ORACLE))
    recalls = [
        len(got.get(q, set()) & exact5[q]) / max(1, len(exact5[q])) for q in exact5
    ]
    recall = sum(recalls) / len(recalls)
    assert recall >= 0.8, f"IVF multiprobe recall@5 {recall:.2f} below 0.8 floor"
