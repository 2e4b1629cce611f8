"""Auto-reset wrapper: the reference Trainer.explore resets the env
mid-batch on done (utils.py ~L90); under a jitted ``lax.scan`` that becomes
a per-env select between the stepped state and a fresh reset drawn from a
carried PRNG key."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from deeprl_network_tpu.envs.base import Env


@struct.dataclass
class AutoResetState:
    env: Any          # underlying env state pytree
    key: jax.Array    # PRNG key for future resets


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


class AutoResetEnv:
    """Wraps an :class:`Env`; on done, the returned state/obs are from a
    fresh reset while reward/done describe the terminating transition."""

    def __init__(self, env: Env):
        self.env = env
        self.spec = env.spec

    def reset(self, key: jax.Array) -> Tuple[AutoResetState, jax.Array]:
        key, sub = jax.random.split(key)
        state, obs = self.env.reset(sub)
        return AutoResetState(env=state, key=key), obs

    def step(self, state: AutoResetState, action: jax.Array
             ) -> Tuple[AutoResetState, jax.Array, jax.Array, jax.Array,
                        Dict[str, jax.Array]]:
        s2, obs2, reward, done, info = self.env.step(state.env, action)
        key, sub = jax.random.split(state.key)
        rs, robs = self.env.reset(sub)
        env_new = _tree_where(done, rs, s2)
        obs_new = jnp.where(done, robs, obs2)
        return (AutoResetState(env=env_new, key=key), obs_new, reward,
                done, info)
