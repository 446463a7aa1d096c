"""Runtime-figure reproduction (reference test_script.py:221-252 /
qcqp_runtime.png): log-scale per-problem runtime bars from the benchmark
suite's JSON output, with the external NNLS oracle column.

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

    labels, ours, external, ext_labels = [], [], [], []
    for r in rows:
        pps = r.get("problems_per_sec") or r.get("solves_per_sec")
        if not pps:
            continue
        labels.append(f"cfg{r['config']}\n{r['desc'].split(',')[0][:26]}")
        ours.append(1.0 / pps)
        ext = r.get("nnls_problems_per_sec")
        external.append(1.0 / ext if ext else float("nan"))
        ext_labels.append("NNLS (scipy, exact)" if ext else "")

    x = range(len(labels))
    w = 0.38
    fig, ax = plt.subplots(figsize=(1.9 * len(labels) + 2, 4.4))
    b1 = ax.bar([i - w / 2 for i in x], ours, w, label="diffqcqp_tpu (per problem, fwd+bwd)")
    b2 = ax.bar(
        [i + w / 2 for i in x], external, w,
        label="external oracle (scipy NNLS, exact f64, 1 thread)",
    )
    ax.set_yscale("log")
    ax.set_ylabel("seconds per problem (log)")
    ax.set_xticks(list(x))
    ax.set_xticklabels(labels, fontsize=8)
    ax.set_title("Per-problem runtime, benchmark suite (lower is better)")
    ax.legend(fontsize=8)
    ax.grid(axis="y", alpha=0.3)
    for bars in (b1, b2):
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
