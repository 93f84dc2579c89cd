"""Render every curves/<run>/run_*/progress.csv into curves/curves.png
(one panel per run: online ReturnAverage vs CumSteps, plus Eval* when
present) — the SURVEY §4/§6 curve-comparison artifact."""
from __future__ import annotations

import csv
import math
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

CURVES = os.path.dirname(os.path.abspath(__file__))


def load(csv_path):
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))

    def col(name):
        out = []
        for r in rows:
            v = r.get(name, "")
            try:
                out.append(float(v))
            except ValueError:
                out.append(float("nan"))
        return out

    return col("CumSteps"), col("ReturnAverage"), col("EvalReturnAverage")


def main():
    runs = []
    skip = ("freeway_ablation", "r2d1_ablation", "_compare")
    for root, _, files in os.walk(CURVES):
        if "progress.csv" in files:
            label = os.path.relpath(root, CURVES)
            if any(s in label for s in skip):
                continue  # ablation/bench runs are tables in README.md
            runs.append((label, os.path.join(root, "progress.csv")))
    runs.sort()
    if not runs:
        print("no progress.csv found")
        return
    n = len(runs)
    cols = 4
    rows_n = math.ceil(n / cols)
    fig, axes = plt.subplots(rows_n, cols,
                             figsize=(4.2 * cols, 3.0 * rows_n),
                             squeeze=False)
    for i, (label, path) in enumerate(runs):
        ax = axes[i // cols][i % cols]
        steps, ret, eval_ret = load(path)
        ax.plot(steps, ret, label="online", lw=1.2)
        if any(v == v for v in eval_ret):
            ax.plot(steps, eval_ret, label="eval", lw=1.2)
        ax.set_title(label, fontsize=8)
        ax.tick_params(labelsize=7)
        ax.legend(fontsize=6)
    for j in range(n, rows_n * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    out = os.path.join(CURVES, "curves.png")
    fig.savefig(out, dpi=110)
    print("wrote", out)


if __name__ == "__main__":
    main()
