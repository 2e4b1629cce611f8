"""Learning validation (SURVEY.md Appendix C test 4): train IA2C / MA2C
variants on CACC catch-up and verify qualitative reference behavior —
episode return rises, collisions stop, headway converges toward h*.

    python scripts/validate_learning.py --agent ma2c_nc --steps 200000
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from deeprl_network_tpu.config import EnvConfig, ModelConfig, TrainConfig
from deeprl_network_tpu.envs.cacc import CACCEnv
from deeprl_network_tpu.utils.rollout import make_a2c


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--agent", default="ia2c")
    p.add_argument("--scenario", default="cacc_catchup")
    p.add_argument("--steps", type=int, default=200_000)
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=5e-4)
    args = p.parse_args()

    coop = 0.9 if args.agent.startswith("ma2c") else -1.0
    ecfg = EnvConfig(scenario=args.scenario, coop_gamma=coop)
    # T=120 (the reference n_step): keep T a multiple of 8 — measured on
    # the v5e toolchain, T=60 scan outputs (padded 60->64 sublanes)
    # trigger a pathological >10min XLA compile; T=120 compiles in ~100s
    mcfg = ModelConfig(batch_size=120, num_envs=args.num_envs,
                       reward_norm=1000.0, lr_init=args.lr)
    tcfg = TrainConfig(total_step=args.steps)
    env = CACCEnv(ecfg)
    from deeprl_network_tpu.utils.logging import resolved_recipe
    print(json.dumps(resolved_recipe(args.agent, ecfg, mcfg, tcfg)),
          flush=True)
    fns = make_a2c(env, mcfg, tcfg, agent=args.agent)
    t0 = time.time()
    ts = fns.init_state(jax.random.key(args.seed))
    jax.block_until_ready(ts.obs)
    print(f"init {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    ts, _m = fns.train_step(ts)
    jax.block_until_ready(_m["loss"])
    print(f"compile {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    log_every = max(args.steps // (20 * mcfg.batch_size * args.num_envs), 1)
    i = 0
    first_ret = None
    while int(ts.step) < args.steps:
        ts, m = fns.train_step(ts)
        i += 1
        if i % log_every == 0:
            ret = float(m["episode_return"])
            if first_ret is None:
                first_ret = ret
            print(json.dumps({
                "step": int(ts.step),
                "episode_return": round(ret, 1),
                "episode_len": round(float(m["episode_len"]), 1),
                "collision_rate": round(float(m["env/collision"]), 4),
                "headway_err": round(float(m["env/headway_err"]), 2),
                "velocity_err": round(float(m["env/velocity_err"]), 2),
                "entropy": round(float(m["entropy"]), 3),
                "sps": round(int(ts.step) / (time.time() - t0), 1),
            }), flush=True)
    # final eval: sampled (reference semantics) and greedy
    for name, greedy in (("sampled", False), ("greedy", True)):
        rets = [float(fns.eval_episode(ts.params, jax.random.key(1000 + s),
                                       None, greedy)["episode_return"])
                for s in range(5)]
        print(json.dumps({f"final_eval_{name}": rets,
                          "mean": float(np.mean(rets)),
                          "first_logged_return": first_ret}), flush=True)


if __name__ == "__main__":
    main()
