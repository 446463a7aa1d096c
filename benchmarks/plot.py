"""Runtime-figure reproduction (reference test_script.py:221-252 /
qcqp_runtime.png): log-scale per-problem runtime bars from the benchmark
suite's JSON output, with the external referee/competitor columns - the
exact scipy NNLS oracle and (config 10) the batched torch-f64 IPM, i.e.
the qpth/OptNet algorithm the reference's own figure compares against.

Usage:
    python benchmarks/run_benchmarks.py > benchmarks/results.jsonl
    python benchmarks/plot.py [benchmarks/results.jsonl]

Writes benchmarks/runtime.png.
"""

from __future__ import annotations

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/results.jsonl"
    rows = [json.loads(line) for line in open(path) if line.strip()]

    labels, ours, nnls, ipm = [], [], [], []
    for r in rows:
        pps = (r.get("problems_per_sec") or r.get("solves_per_sec")
               or r.get("box_problems_per_sec"))
        if not pps:
            continue
        labels.append(f"cfg{r['config']}\n{r['desc'].split(',')[0][:26]}")
        ours.append(1.0 / pps)
        ext = r.get("nnls_problems_per_sec") or r.get(
            "box_bvls_problems_per_sec"
        )
        nnls.append(1.0 / ext if ext else float("nan"))
        comp = r.get("ipm_problems_per_sec")
        ipm.append(1.0 / comp if comp else float("nan"))

    x = range(len(labels))
    w = 0.27
    fig, ax = plt.subplots(figsize=(1.9 * len(labels) + 2, 4.4))
    groups = [
        (ax.bar([i - w for i in x], ours, w,
                label="diffqcqp_tpu (per problem, fwd+bwd)")),
        (ax.bar(list(x), nnls, w,
                label="exact oracle (scipy NNLS/BVLS, f64, 1 thread)")),
        (ax.bar([i + w for i in x], ipm, w,
                label="batched IPM competitor (qpth algorithm, torch f64 CPU)")),
    ]
    ax.set_yscale("log")
    ax.set_ylabel("seconds per problem (log)")
    ax.set_xticks(list(x))
    ax.set_xticklabels(labels, fontsize=8)
    ax.set_title("Per-problem runtime, benchmark suite (lower is better)")
    ax.legend(fontsize=8)
    ax.grid(axis="y", alpha=0.3)
    for bars in groups:
        for rect in bars:
            h = rect.get_height()
            if h == h:  # not NaN
                ax.annotate(
                    f"{h:.2e}", (rect.get_x() + rect.get_width() / 2, h),
                    ha="center", va="bottom", fontsize=7,
                )
    fig.tight_layout()
    out = "benchmarks/runtime.png"
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
