"""CACC family comparison harness (SURVEY section 6 CACC row / Appendix C
test 4): train every algorithm family on a CACC scenario across seeds,
logging the discriminative metrics — collision rate per step and mean
episode length — plus a final sampled-policy eval.

    python scripts/train_cacc_families.py --scenario cacc_slowdown \
        --agents ia2c,ia2c_fp,ia2c_cu,ma2c_nc,ma2c_cnet,ma2c_dial \
        --steps 10000000 --seeds 0,1,2 --out results/cacc_slowdown_r2.jsonl

Round-1 finding this harness exists to close: at a 2M-step budget with
B=64 envs an "update" consumes 7680 global steps, so 2M steps is only
~260 optimizer updates — CommNet/DIAL never escaped the crash regime
(VERDICT Missing #5). The fused thoughput (~150k steps/s) makes a 5x
budget nearly free; seeds run in-process to pay each family's compile
once.
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
from deeprl_network_tpu.utils.rollout import make_a2c


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="cacc_slowdown")
    p.add_argument("--agents",
                   default="ia2c,ia2c_fp,ia2c_cu,ma2c_nc,ma2c_cnet,ma2c_dial")
    p.add_argument("--steps", type=int, default=10_000_000)
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--entropy", type=float, default=0.01)
    p.add_argument("--entropy-decay", default="constant",
                   choices=("constant", "linear"),
                   help="annealing the entropy bonus matters for final "
                        "tracking quality under the profile reward: the "
                        "residual cost of a stochastic-mixing policy is "
                        "action dither (u jumps between gain pairs)")
    p.add_argument("--collision-penalty", type=float, default=1000.0,
                   help="raw crash penalty (EnvConfig.collision_penalty). "
                        "At the 1000 default with reward_norm=1000 the "
                        "post-norm penalty (-1) is worth only ~50 steps "
                        "of good tracking cost, which makes the "
                        "crash-early attractor return-competitive with "
                        "surviving - see results/README.md CACC analysis")
    p.add_argument("--reward-clip", type=float, default=None,
                   help="post-norm reward clip. Default: auto = "
                        "max(2, collision_penalty/reward_norm) so a "
                        "raised crash penalty is never silently clipped "
                        "back to the default clip ceiling (the r4 "
                        "penalty-5000 probe would otherwise test -2, "
                        "not -5)")
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--kickstart", type=float, default=0.0,
                   help="CE weight toward the fixed-gain OVM teacher "
                        "(CACCEnv.controller_action), annealed to 0 by "
                        "kickstart-ratio * steps — the same decisive "
                        "ingredient as the ATSC recipe")
    p.add_argument("--kickstart-ratio", type=float, default=0.5)
    p.add_argument("--v-target", default="profile",
                   choices=("fixed", "profile"),
                   help="EnvConfig.v_target: what the w_v velocity cost "
                        "is charged against. 'profile' (spec of record "
                        "since r5) makes slow-down survival "
                        "return-preferred teacher-free; 'fixed' restores "
                        "the r1-r4 crash-optimal engine for A/B "
                        "(scripts/cacc_reward_decompose.py)")
    p.add_argument("--reward-norm", type=float, default=1000.0)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    sink = open(args.out, "w") if args.out else sys.stdout

    def emit(row):
        print(json.dumps(row), file=sink, flush=True)
        if sink is not sys.stdout:
            print(json.dumps(row), file=sys.stderr, flush=True)

    emit({"run": vars(args)})
    seeds = [int(s) for s in args.seeds.split(",")]

    for agent in args.agents.split(","):
        agent = agent.strip()
        coop = -1.0 if agent in ("ia2c", "ia2c_fp") else 0.9
        env = CACCEnv(EnvConfig(scenario=args.scenario, coop_gamma=coop,
                                collision_penalty=args.collision_penalty,
                                v_target=args.v_target))
        rclip = (args.reward_clip if args.reward_clip is not None
                 else max(2.0, args.collision_penalty / args.reward_norm))
        mcfg = ModelConfig(batch_size=120, num_envs=args.num_envs,
                           reward_norm=args.reward_norm, reward_clip=rclip,
                           gamma=args.gamma, lr_init=args.lr,
                           entropy_coef=args.entropy,
                           entropy_decay=args.entropy_decay,
                           kickstart_coef=args.kickstart,
                           kickstart_ratio=args.kickstart_ratio,
                           lr_decay="linear")
        tcfg = TrainConfig(total_step=args.steps)
        from deeprl_network_tpu.utils.logging import resolved_recipe
        emit(resolved_recipe(agent, env.cfg, mcfg, tcfg))
        fns = make_a2c(env, mcfg, tcfg, agent=agent)
        spu = fns.steps_per_update
        total_updates = args.steps // spu
        log_every = max(total_updates // 10, 1)

        for seed in seeds:
            t0 = time.time()
            ts = fns.init_state(jax.random.key(seed))
            window = []
            for i in range(total_updates):
                ts, m = fns.train_step(ts)
                window.append(m)
                window = window[-10:]
                if i % 5 == 0:
                    jax.block_until_ready(m["loss"])
                if (i + 1) % log_every == 0:
                    emit({"agent": agent, "seed": seed,
                          "step": (i + 1) * spu,
                          "episode_len": round(float(m["episode_len"]), 1),
                          "collision_rate": round(
                              float(m["env/collision"]), 5),
                          "headway_err": round(
                              float(m["env/headway_err"]), 2),
                          "sps": round((i + 1) * spu / (time.time() - t0),
                                       1)})
            # final training-window metrics (device sync) + sampled eval
            coll = float(np.mean([np.asarray(w["env/collision"])
                                  for w in window]))
            eplen = float(np.mean([np.asarray(w["episode_len"])
                                   for w in window]))
            evals = []
            for s in range(3):
                out = fns.eval_episode(ts.params, jax.random.key(2000 + s),
                                       None, False)
                evals.append({k: float(v) for k, v in out.items()})
            emit({"agent": agent, "seed": seed, "final": True,
                  "collision_rate": coll, "episode_len": eplen,
                  "eval_episode_len": float(np.mean(
                      [e["episode_len"] for e in evals])),
                  "eval_return": float(np.mean(
                      [e["episode_return"] for e in evals])),
                  "eval_collision": float(np.mean(
                      [e.get("env/collision", 0.0) for e in evals]))})


if __name__ == "__main__":
    main()
