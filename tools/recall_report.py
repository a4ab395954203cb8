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
    mp = report["paths"]["similarity_ivf_topk_multiprobe"]["recall_at_5"]
    report["floor"] = RECALL_FLOOR
    report["pass"] = mp >= RECALL_FLOOR
    print(json.dumps(report))
    spark.stop()
    return 0 if mp >= RECALL_FLOOR else 1


if __name__ == "__main__":
    sys.exit(main())
