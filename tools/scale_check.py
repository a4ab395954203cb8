"""Scaling check: run queries at every available scale factor and report
how wall time grows with data size.

The 100 TB argument in one table: a query whose time is flat across
sf0.001→0.1 is dominated by fixed per-query cost (planning, codegen, task
launch — amortizes away at scale); one that grows linearly is data-bound
and its slope is the number that matters.  Superlinear growth flags a
plan that won't survive 100×.

sf1 is the scratch dataset written by ``tools/make_scale_data.py``
(timing-only; see that file's docstring) — when present it adds a third
decade so the headline slope is measured over 1000× data, not 100×.

    python tools/scale_check.py                      # all bench-tagged + tpch
    python tools/scale_check.py tpch_q1 tpch_q5      # subset
    python tools/scale_check.py --top 12             # 12 most expensive per BENCH
    python tools/scale_check.py --top 12 --md SCALE.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

SFS = [
    ("0.001", "/root/testdata/sf0.001"),
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
    ("1", os.path.join(_ROOT, ".scale", "sf1")),
]


def _top_from_bench(n: int) -> list[str]:
    """The n most expensive entries in the latest BENCH_r*.json."""
    import glob

    benches = sorted(glob.glob(os.path.join(_ROOT, "BENCH_r*.json")))
    if not benches:
        return []
    with open(benches[-1]) as f:
        d = json.load(f)
    qs = (d.get("parsed") or d).get("queries", {})
    return [k for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:n]]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0,
                    help="pick the N most expensive entries from the latest bench")
    ap.add_argument("--md", default=None, help="also write a markdown slope table")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sink", choices=["collect", "noop"], default="collect",
                    help="collect = bench-comparable (includes driver fetch);"
                         " noop = full distributed execution, no fetch —"
                         " isolates the PLAN cost (write.format('noop'))")
    args = ap.parse_args()

    from datafusion_spark import get_spark
    from datafusion_spark.queries import QUERIES, TAGS

    spark = get_spark("scale_check")
    spark.sparkContext.setLogLevel("ERROR")

    if args.names:
        names = args.names
    elif args.top:
        names = [n for n in _top_from_bench(args.top) if n in QUERIES]
    else:
        names = [n for n in sorted(QUERIES)
                 if "bench" in TAGS.get(n, ()) or n.startswith("tpch_q")]
    sfs = [(label, d) for label, d in SFS if os.path.isdir(d)]
    for _, d in sfs:  # warm footers
        spark.read.parquet(os.path.join(d, "lineitem.parquet")).count()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        per_sf: dict[str, float] = {}
        for label, d in sfs:
            runs = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, d)
                if args.sink == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()
                runs.append(time.perf_counter() - t0)
            per_sf[label] = round(min(runs), 3)
        out[name] = per_sf
        vals = list(per_sf.values())
        growth = round(vals[-1] / vals[0], 2) if vals[0] > 0 else None
        span = round(float(sfs[-1][0]) / float(sfs[0][0]))
        print(f"{name:32s} " + "  ".join(f"sf{k}={v:.2f}s" for k, v in per_sf.items())
              + f"  growth_{span}x_data={growth}x")

    if args.md:
        _write_md(args.md, out, sfs)
    print(json.dumps({"scale_check": out}))


def _write_md(path: str, out: dict[str, dict[str, float]], sfs) -> None:
    labels = [label for label, _ in sfs]
    lines = [
        "# SCALE — wall-time slope per decade of data",
        "",
        "Measured by `tools/scale_check.py` on local[32]; min of 2 runs per",
        "cell.  sf1 is the timing-only scratch scale-up written by",
        "`tools/make_scale_data.py` (10× sf0.1, TPC-H-style key remapping).",
        "",
        "`slope(a→b)` = time ratio across a 10× data step.  Fixed per-query",
        "overhead (planning/codegen/task launch, ~0.2 s here) dominates the",
        "small SFs, so the **last decade (sf0.1→sf1) is the honest signal**:",
        "≈10 means linear in data (what a scan/shuffle-bound plan should do),",
        "≪10 means still overhead-bound, ≫10 flags a plan that won't survive",
        "100×.",
        "",
        "| entry | " + " | ".join(f"sf{l}" for l in labels)
        + " | " + " | ".join(f"slope({labels[i]}→{labels[i+1]})" for i in range(len(labels) - 1))
        + " |",
        "|---|" + "---|" * (2 * len(labels) - 1),
    ]
    for name, per_sf in out.items():
        vals = [per_sf.get(l) for l in labels]
        slopes = []
        for i in range(len(vals) - 1):
            if vals[i] and vals[i + 1] and vals[i] > 0:
                slopes.append(f"{vals[i+1]/vals[i]:.1f}x")
            else:
                slopes.append("—")
        lines.append("| `" + name + "` | "
                     + " | ".join(f"{v:.2f}s" if v is not None else "—" for v in vals)
                     + " | " + " | ".join(slopes) + " |")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
