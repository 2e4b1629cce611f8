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


# fixed categorical order + hue per family (Okabe-Ito CVD-safe palette,
# Wong 2011; ordered so neighboring legend entries are far in hue —
# color follows the FAMILY identity, never the rank in a given figure)
FAMILY_COLORS = {
    "ia2c": "#0072B2", "ia2c_fp": "#E69F00", "ia2c_cu": "#56B4E9",
    "ma2c_nc": "#D55E00", "ma2c_cnet": "#009E73", "ma2c_dial": "#CC79A7",
}


def plot_families(path, out):
    """One figure per family-sweep jsonl (train_atsc_families.py /
    train_cacc_families.py): per-seed thin training curves + per-family
    mean, final sampled eval vs the hand-controller bar."""
    import json
    rows = [json.loads(l) for l in open(path) if l.strip()]
    base = None
    for r in rows:
        if "baseline_best" in r and "agent" not in r:
            base = r["baseline_best"]
    series, finals = {}, {}
    for r in rows:
        if "agent" not in r:
            continue
        key = (r["agent"], r.get("seed", 0))
        if r.get("final"):
            finals.setdefault(r["agent"], []).append(r["mean"])
        elif "step" in r and "episode_return" in r:
            series.setdefault(key, []).append(
                (r["step"], r["episode_return"]))
    fig, axes = plt.subplots(1, 2, figsize=(12, 4.5))
    # union of families seen anywhere: a family that logged only `final`
    # eval rows (no training curve) must still reach the bar panel
    # (ADVICE round 3)
    order = [a for a in FAMILY_COLORS
             if any(k[0] == a for k in series) or a in finals]
    for agent in order:
        c = FAMILY_COLORS[agent]
        for (a, s), pts in series.items():
            if a != agent:
                continue
            xs, ys = zip(*sorted(pts))
            axes[0].plot(xs, ys, color=c, lw=1.2, alpha=0.75,
                         label=agent if s == min(
                             sd for aa, sd in series if aa == agent)
                         else None)
    if base is not None:
        axes[0].axhline(base, color="#444444", lw=1.2, ls="--")
        axes[0].text(0.02, base, " strongest hand controller",
                     transform=axes[0].get_yaxis_transform(),
                     va="bottom", fontsize=8, color="#444444")
    axes[0].set_xlabel("env steps")
    axes[0].set_ylabel("training episode return")
    axes[0].set_title(os.path.splitext(os.path.basename(path))[0])
    axes[0].legend(fontsize=8)
    means = [float(np.mean(finals[a])) for a in order if a in finals]
    pos = np.arange(len(means))
    axes[1].bar(pos, means, 0.62,
                color=[FAMILY_COLORS[a] for a in order if a in finals])
    for i, a in enumerate([a for a in order if a in finals]):
        for v in finals[a]:
            axes[1].plot(i, v, "o", ms=4, mfc="white", mec="#333333",
                         mew=0.8)
    if base is not None:
        axes[1].axhline(base, color="#444444", lw=1.2, ls="--")
    axes[1].set_xticks(pos,
                       [a for a in order if a in finals],
                       rotation=20, fontsize=8)
    axes[1].set_ylabel("final sampled eval (mean; dots = seeds)")
    axes[1].set_title("held-out evaluation vs hand-controller bar")
    for ax in axes:
        ax.grid(alpha=0.25)
        ax.spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


def plot_cacc(path, out):
    """CACC family-sweep jsonl: per-seed collision-rate curves (log y —
    the discriminative metric) and final eval episode length."""
    import json
    rows = [json.loads(l) for l in open(path) if l.strip()]
    series, finals = {}, {}
    for r in rows:
        if "agent" not in r:
            continue
        if r.get("final"):
            finals.setdefault(r["agent"], []).append(
                r.get("eval_episode_len", np.nan))
        elif "step" in r and "collision_rate" in r:
            series.setdefault((r["agent"], r.get("seed", 0)), []).append(
                (r["step"], max(r["collision_rate"], 1e-5)))
    fig, axes = plt.subplots(1, 2, figsize=(12, 4.5))
    order = [a for a in FAMILY_COLORS
             if any(k[0] == a for k in series) or a in finals]
    for agent in order:
        c = FAMILY_COLORS[agent]
        first = True
        for (a, s), pts in sorted(series.items()):
            if a != agent:
                continue
            xs, ys = zip(*sorted(pts))
            axes[0].plot(xs, ys, color=c, lw=1.2, alpha=0.75,
                         label=agent if first else None)
            first = False
    axes[0].set_yscale("log")
    axes[0].set_xlabel("env steps")
    axes[0].set_ylabel("collision rate / step (training, log)")
    axes[0].set_title(os.path.splitext(os.path.basename(path))[0])
    axes[0].legend(fontsize=8)
    have = [a for a in order if a in finals]
    pos = np.arange(len(have))
    axes[1].bar(pos, [float(np.mean(finals[a])) for a in have], 0.62,
                color=[FAMILY_COLORS[a] for a in have])
    for i, a in enumerate(have):
        for v in finals[a]:
            axes[1].plot(i, v, "o", ms=4, mfc="white", mec="#333333",
                         mew=0.8)
    axes[1].axhline(600, color="#444444", lw=1.2, ls="--")
    axes[1].text(0.02, 600, " full episode (600)", fontsize=8,
                 color="#444444", va="bottom",
                 transform=axes[1].get_yaxis_transform())
    axes[1].set_xticks(pos, have, rotation=20, fontsize=8)
    axes[1].set_ylabel("final eval episode length (dots = seeds)")
    axes[1].set_title("sampled eval: surviving the slow-down")
    for ax in axes:
        ax.grid(alpha=0.25)
        ax.spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs", nargs="*", default=[],
                   help="run base dirs (each with data/train_log.csv)")
    p.add_argument("--jsonl", nargs="*", default=[],
                   help="demo-script jsonl training logs (results/*.jsonl)")
    p.add_argument("--families", default=None,
                   help="family-sweep jsonl (one figure: curves + final "
                        "eval bars vs the hand-controller bar)")
    p.add_argument("--cacc", default=None,
                   help="CACC family-sweep jsonl (collision curves + "
                        "final eval episode length)")
    p.add_argument("--out", default="training_curves.png")
    p.add_argument("--metric", default="episode_return")
    args = p.parse_args()

    if args.families:
        plot_families(args.families, args.out)
        return
    if args.cacc:
        plot_cacc(args.cacc, args.out)
        return

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
