"""Apportion the fused train-step cost on real hardware.

Times, at the flagship grid shape, several program variants whose deltas
isolate where the ~50 ms/update goes:

  full      : fused MA2C_NC train step (rollout+BPTT+update)
  ia2c      : same without comm einsums (isolates NeurComm message cost)
  no_grad   : rollout scan only, no gradient (isolates BPTT backward)
  env_only  : env-dynamics scan only, no policy (isolates the SFQ engine)

    python scripts/profile_step.py --num-envs 512
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from deeprl_network_tpu.config import EnvConfig, ModelConfig, TrainConfig
from deeprl_network_tpu.envs.grid import LargeGridEnv
from deeprl_network_tpu.envs.wrappers import AutoResetEnv
from deeprl_network_tpu.utils.rollout import make_a2c


def time_it(fn, arg, n=20, sync=lambda out: out, thread=False):
    """thread=True: fn's first output replaces arg next call (needed for
    donated TrainState buffers)."""
    out = fn(arg)  # compile
    jax.block_until_ready(sync(out))
    cur = out[0] if thread else arg
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(cur)
        if thread:
            cur = out[0]
    jax.block_until_ready(sync(out))
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=512)
    p.add_argument("--t", type=int, default=120)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--sparse-comm", action="store_true")
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()
    B, T = args.num_envs, args.t

    ecfg = EnvConfig(scenario="large_grid", coop_gamma=0.9)
    tcfg = TrainConfig(total_step=10**9)
    res = {}

    for name, agent in (("full_ma2c_nc", "ma2c_nc"), ("ia2c", "ia2c")):
        mcfg = ModelConfig(batch_size=T, num_envs=B,
                           compute_dtype=args.dtype,
                           sparse_comm=args.sparse_comm,
                           remat=args.remat)
        env = LargeGridEnv(ecfg)
        fns = make_a2c(env, mcfg, tcfg, agent=agent)
        ts = fns.init_state(jax.random.key(0))
        dt = time_it(fns.train_step, ts,
                     sync=lambda out: out[1]["loss"], thread=True)
        res[name] = dt
        print(f"{name}: {dt*1e3:.1f} ms/update "
              f"({B*T/dt/1e6:.2f}M steps/s)", file=sys.stderr, flush=True)

    # env-only scan: T steps of batched dynamics + auto-reset, no policy
    env = LargeGridEnv(ecfg)
    wenv = AutoResetEnv(env)

    @jax.jit
    def env_scan(state, obs, key):
        def body(c, _):
            state, obs, key = c
            key, k = jax.random.split(key)
            a = jax.random.randint(k, (B, env.spec.n_agent), 0,
                                   env.spec.n_a_max)
            state2, obs2, r, d, info = jax.vmap(wenv.step)(state, a)
            return (state2, obs2, key), r.sum()
        (state, obs, key), rs = jax.lax.scan(body, (state, obs, key),
                                             None, length=T)
        return state, obs, key, rs.sum()

    key = jax.random.key(0)
    state, obs = jax.vmap(wenv.reset)(jax.random.split(key, B))
    dt = time_it(lambda s: env_scan(s, obs, key), state,
                 sync=lambda out: out[3])
    res["env_only"] = dt
    print(f"env_only: {dt*1e3:.1f} ms ({B*T/dt/1e6:.2f}M steps/s)",
          file=sys.stderr, flush=True)
    print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
