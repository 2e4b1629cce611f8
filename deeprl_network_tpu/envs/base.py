"""Environment API: the TPU-native counterpart of the reference env surface.

The reference env API (SURVEY.md section 1, L4->L1) is stateful-object
style: ``env.reset() -> obs``, ``env.step(action) -> (obs, reward, done,
global_reward)`` plus attributes ``n_agent, n_s_ls, n_a_ls, neighbor_mask,
distance_mask, coop_gamma``. Here envs are *pure functions over explicit
state pytrees* so the whole rollout lives inside one jitted ``lax.scan``:

    state, obs = env.reset(key)
    state, obs, reward, done, info = env.step(state, action)

An :class:`Env` instance holds only *static* data (graph masks, phase
tables, normalizers) as numpy arrays, so its methods are trivially
jit/vmap-compatible closures. Batched execution is plain ``jax.vmap`` over
the state pytree; auto-reset for continuous rollouts lives in
``envs/wrappers.py``.

Heterogeneous per-agent spaces (Monaco-style, reference real_net_env.py)
are padded: obs to ``n_s_max`` with an ``obs_mask``, actions to ``n_a_max``
with an ``action_mask`` used as a -inf logit mask (SURVEY.md section 7
"hard parts").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import numpy as np


@dataclass(frozen=True)
class EnvSpec:
    """Static multi-agent space description (reference env attributes)."""

    n_agent: int
    n_s_ls: Tuple[int, ...]          # per-agent obs dims (pre-padding)
    n_a_ls: Tuple[int, ...]          # per-agent action counts
    neighbor_mask: np.ndarray        # [N, N] {0,1}, no self-loops
    distance_mask: np.ndarray        # [N, N] int hop distances
    coop_gamma: float

    @property
    def n_s_max(self) -> int:
        return max(self.n_s_ls)

    @property
    def n_a_max(self) -> int:
        return max(self.n_a_ls)

    @property
    def obs_mask(self) -> np.ndarray:
        m = np.zeros((self.n_agent, self.n_s_max), np.float32)
        for i, n in enumerate(self.n_s_ls):
            m[i, :n] = 1.0
        return m

    @property
    def action_mask(self) -> np.ndarray:
        m = np.zeros((self.n_agent, self.n_a_max), np.float32)
        for i, n in enumerate(self.n_a_ls):
            m[i, :n] = 1.0
        return m

    def spatial_discount(self) -> np.ndarray:
        """Reward mixing matrix D with r_tilde = D @ r.

        coop_gamma alpha >= 0: D_ij = alpha^d(i,j) (spatial discounting,
        reference MultiAgentOnPolicyBuffer / MA2C return computation,
        SURVEY.md Appendix A). alpha < 0: every agent sees the global sum
        (reference: global_reward broadcast, Trainer.explore ~L90).
        """
        if self.coop_gamma < 0:
            return np.ones((self.n_agent, self.n_agent), np.float32)
        return np.power(self.coop_gamma,
                        self.distance_mask.astype(np.float32)).astype(np.float32)


class Env:
    """Base class: holds an :class:`EnvSpec`; subclasses implement
    ``reset(key)`` and ``step(state, action)`` as pure functions."""

    spec: EnvSpec

    def reset(self, key: jax.Array):
        raise NotImplementedError

    def step(self, state, action) -> Tuple[Any, jax.Array, jax.Array,
                                           jax.Array, Dict[str, jax.Array]]:
        raise NotImplementedError

    def record(self, state) -> Dict[str, jax.Array]:
        """Per-step measurement series for evaluation output (reference
        TrafficSimulator init_data/_measure_traffic_step/output_data and
        CACCEnv output_data; SURVEY.md section 2.2 items 6, 9). Returns a
        dict of arrays collected every control step by record_episode."""
        return {}

    def prev_action(self, state):
        """[N] previous control action, or None if the env family has no
        persistent action notion (CACC gains are memoryless). Used by
        training-only switch-cost shaping (ModelConfig.switch_penalty)."""
        return None

    def controller_action(self, state):
        """The strongest built-in hand controller's action for ``state``,
        or None. ATSC envs return queue-scored hysteresis (the baseline
        of record and the kickstart teacher); CACC has no controller in
        the reference either."""
        return None

    # convenience passthroughs matching the reference attribute names
    @property
    def n_agent(self) -> int:
        return self.spec.n_agent

    @property
    def n_s_ls(self):
        return self.spec.n_s_ls

    @property
    def n_a_ls(self):
        return self.spec.n_a_ls

    @property
    def neighbor_mask(self):
        return self.spec.neighbor_mask

    @property
    def distance_mask(self):
        return self.spec.distance_mask

    @property
    def coop_gamma(self):
        return self.spec.coop_gamma


def hop_distances(adj: np.ndarray) -> np.ndarray:
    """All-pairs hop distance from a {0,1} adjacency (BFS / min-plus)."""
    n = adj.shape[0]
    dist = np.full((n, n), n + 1, np.int32)
    np.fill_diagonal(dist, 0)
    dist[adj > 0] = 1
    for _ in range(n):
        new = np.minimum(dist, (dist[:, :, None] + dist[None, :, :]).min(1))
        if np.array_equal(new, dist):
            break
        dist = new
    return dist
