"""Slow-down trajectory figure: learned policy vs the hand controller.

The reference's CACC evaluation artifact is per-step headway/velocity
series plots (CACCEnv.output_data, SURVEY.md section 2.2 item 9). This
produces the round-5 equivalent on the spec-of-record profile-reward
engine: train MA2C_NC teacher-free at defaults, then record one
noise-controlled episode each for (a) the learned policy (sampled — the
reference eval protocol), (b) the spacing-corrected greedy hand
controller (CACCEnv.controller_action), and plot velocity tracking of
the leader ramp plus headway per vehicle.

    python scripts/slowdown_demo.py --steps 50000000 \
        --out results/slowdown_traj_r5.png --jsonl results/slowdown_demo_r5.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from deeprl_network_tpu.config import EnvConfig, ModelConfig, TrainConfig
from deeprl_network_tpu.envs.cacc import CACCEnv
from deeprl_network_tpu.utils.logging import resolved_recipe
from deeprl_network_tpu.utils.rollout import make_a2c


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50_000_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-seed", type=int, default=2000)
    p.add_argument("--out", default="results/slowdown_traj_r5.png")
    p.add_argument("--jsonl", default=None)
    args = p.parse_args()

    sink = open(args.jsonl, "w") if args.jsonl else sys.stdout

    def emit(row):
        print(json.dumps(row), file=sink, flush=True)
        if sink is not sys.stdout:
            print(json.dumps(row), file=sys.stderr, flush=True)

    ecfg = EnvConfig(scenario="cacc_slowdown", coop_gamma=0.9)
    mcfg = ModelConfig(batch_size=120, num_envs=64, reward_norm=1000.0,
                       lr_decay="linear", entropy_decay="linear")
    tcfg = TrainConfig(total_step=args.steps)
    emit(resolved_recipe("ma2c_nc", ecfg, mcfg, tcfg))
    env = CACCEnv(ecfg)
    fns = make_a2c(env, mcfg, tcfg, agent="ma2c_nc")

    t0 = time.time()
    ts = fns.init_state(jax.random.key(args.seed))
    spu = fns.steps_per_update
    for i in range(args.steps // spu):
        ts, m = fns.train_step(ts)
        if i % 5 == 0:
            jax.block_until_ready(m["loss"])
    emit({"trained_steps": int(jax.device_get(ts.step)),
          "train_s": round(time.time() - t0, 1),
          "final_episode_len": float(jax.device_get(m["episode_len"]))})

    key = jax.random.key(args.eval_seed)
    series = {
        "learned (MA2C_NC, sampled)": jax.device_get(
            fns.record_episode(ts.params, key, None, "sample")),
        "spacing controller": jax.device_get(
            fns.record_episode(None, key, None, "controller")),
    }
    for name, s in series.items():
        alive = s["alive"]
        ret = float((s["reward"].sum(-1) * alive).sum())
        emit({"policy": name, "episode_len": float(alive.sum()),
              "return_raw": round(ret, 1),
              "min_headway": float((s["headway"].min(-1)
                                    * alive + 1e9 * (1 - alive)).min())})

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(12, 7), sharex=True)
    dt = ecfg.dt
    for col, (name, s) in enumerate(series.items()):
        tt = np.arange(len(s["velocity"])) * dt
        vax, hax = axes[0, col], axes[1, col]
        for i in range(s["velocity"].shape[1]):
            vax.plot(tt, s["velocity"][:, i], lw=0.9, alpha=0.8)
            hax.plot(tt, s["headway"][:, i], lw=0.9, alpha=0.8)
        vax.plot(tt, s["v_lead"], "k--", lw=1.6, label="leader profile")
        hax.axhline(ecfg.h_star, color="#444444", ls="--", lw=1.2)
        hax.axhline(ecfg.h_min, color="#aa2222", ls=":", lw=1.2)
        vax.set_title(name, fontsize=11)
        vax.set_ylabel("velocity (m/s)" if col == 0 else "")
        hax.set_ylabel("headway (m)" if col == 0 else "")
        hax.set_xlabel("time (s)")
        vax.legend(fontsize=8)
        for ax in (vax, hax):
            ax.grid(alpha=0.25)
            ax.spines[["top", "right"]].set_visible(False)
    fig.suptitle("CACC slow-down, profile reward (round 5): 8 vehicles "
                 "track the 30->15 m/s ramp", fontsize=12)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    emit({"wrote": args.out})


if __name__ == "__main__":
    main()
