"""Plot training curves and evaluation series from run dirs (reference
component 11, SURVEY.md section 2.1: README training-curve and eval
comparison figures / result_plot notebook).

    python scripts/plot_results.py --runs /tmp/run_ia2c /tmp/run_ma2c_nc \
        --out /tmp/curves.png
"""

from __future__ import annotations

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def load_csv(path):
    import csv
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return {k: np.array([float(r[k]) for r in rows])
            for k in rows[0]} if rows else {}


def load_jsonl(path):
    import json
    rows = [json.loads(l) for l in open(path) if l.strip()]
    rows = [r for r in rows if "step" in r]  # skip eval-summary lines
    keys = rows[0].keys() if rows else ()
    return {k: np.array([float(r[k]) for r in rows]) for k in keys}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs", nargs="*", default=[],
                   help="run base dirs (each with data/train_log.csv)")
    p.add_argument("--jsonl", nargs="*", default=[],
                   help="demo-script jsonl training logs (results/*.jsonl)")
    p.add_argument("--out", default="training_curves.png")
    p.add_argument("--metric", default="episode_return")
    args = p.parse_args()

    fig, axes = plt.subplots(1, 2, figsize=(12, 4.5))
    for path in args.jsonl:
        name = os.path.splitext(os.path.basename(path))[0]
        d = load_jsonl(path)
        if args.metric in d:
            axes[0].plot(d["step"], d[args.metric], label=name)
    for run in args.runs:
        name = os.path.basename(run.rstrip("/"))
        tl = os.path.join(run, "data", "train_log.csv")
        if os.path.exists(tl):
            d = load_csv(tl)
            if args.metric in d:
                axes[0].plot(d["step"], d[args.metric], label=name)
        te = os.path.join(run, "data", "test_log.csv")
        if os.path.exists(te):
            d = load_csv(te)
            if "episode_return" in d:
                axes[1].plot(d["step"], d["episode_return"], "o-",
                             label=name)
    axes[0].set_xlabel("env steps")
    axes[0].set_ylabel(args.metric)
    axes[0].set_title("training")
    axes[1].set_xlabel("env steps")
    axes[1].set_ylabel("greedy episode return")
    axes[1].set_title("held-out evaluation")
    for ax in axes:
        ax.legend()
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
