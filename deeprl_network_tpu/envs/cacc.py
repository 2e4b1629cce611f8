"""CACC vehicle-platoon environment: Optimal Velocity Model dynamics in JAX.

TPU-native rebuild of the reference ``envs/cacc_env.py`` (SURVEY.md
section 2.2 item 9 and call stack 3.5 — the spec of record, since the
reference mount was empty). The physics is a pure ``step`` function over a
small state pytree, so thousands of platoons integrate in lockstep under
``jit``/``vmap``; there is no host round-trip anywhere in the episode.

Behavioral spec implemented here (reference cacc_env.py, symbols
``CACCEnv.step/_get_obs/_get_reward``):

- vehicles i = 0..n-1 trail a virtual leader; headway h_i is the gap to
  predecessor (the leader for i = 0).
- OVM headway law:  V(h) = 0 for h < h_st;
  v_max/2 * (1 - cos(pi (h - h_st)/(h_go - h_st))) for h_st <= h <= h_go;
  v_max above.
- discrete action a_i in {0..3} selects OVM gains
  (alpha, beta) in {(0,0), (0.5,0), (0,0.5), (0.5,0.5)};
  control u_i = alpha*(V(h_i) - v_i) + beta*(v_{i-1} - v_i), clipped to
  +-u_max; Euler integration of v then h at dt = 0.1 s.
- obs per agent: [(v - v*)/v*, (v_lead - v)/5, (h - h*)/h*, u/u_max].
- reward_i = -(w_h (h_i-h*)^2 + w_v (v_i-v*)^2 + w_u u_i^2); a collision
  (min h < h_min) gives every agent -collision_penalty and ends the episode.
- scenarios: ``catchup`` (lead vehicle starts at catchup_ratio*h_star gap,
  leader cruises at v*), ``slowdown`` (everything starts at slowdown_v0 and
  the leader ramps linearly down to v* over slowdown_t seconds).

RNG parity note (SURVEY.md section 7 "hard parts"): initial h/v noise is
drawn from the JAX key, but ``reset_with_noise`` accepts explicit noise
vectors so a reference-generated noise sequence can be injected for
trajectory-exact tests.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from deeprl_network_tpu.config import EnvConfig
from deeprl_network_tpu.envs.base import Env, EnvSpec

# (alpha, beta) OVM-gain table; action = index (reference cacc_env.py
# ACTION table, SURVEY.md section 2.2 item 9).
OVM_GAINS = np.array(
    [[0.0, 0.0], [0.5, 0.0], [0.0, 0.5], [0.5, 0.5]], np.float32
)


@struct.dataclass
class CACCState:
    h: jax.Array       # [n] headway to predecessor (m)
    v: jax.Array       # [n] velocity (m/s)
    u: jax.Array       # [n] previous control (m/s^2)
    v_lead: jax.Array  # [] leader velocity
    t: jax.Array       # [] step count (int32)
    done: jax.Array    # [] bool


def _line_graph(n: int) -> np.ndarray:
    adj = np.zeros((n, n), np.float32)
    for i in range(n - 1):
        adj[i, i + 1] = 1.0
        adj[i + 1, i] = 1.0
    return adj


class CACCEnv(Env):
    """8-vehicle platoon; scenario in {"catchup", "slowdown"}."""

    N_OBS = 4
    N_ACTION = 4

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg
        self.scenario = cfg.scenario.replace("cacc_", "")
        if self.scenario not in ("catchup", "slowdown"):
            raise ValueError(f"unknown CACC scenario {cfg.scenario}")
        n = cfg.n_vehicle
        adj = _line_graph(n)
        dist = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
        self.spec = EnvSpec(
            n_agent=n,
            n_s_ls=(self.N_OBS,) * n,
            n_a_ls=(self.N_ACTION,) * n,
            neighbor_mask=adj,
            distance_mask=dist.astype(np.int32),
            coop_gamma=cfg.coop_gamma,
        )
        # reward normalizer: the raw quadratic costs are O(100); the
        # reference divides by [MODEL_CONFIG] reward_norm in the buffer, we
        # keep rewards raw here and normalize in the rollout (parity with
        # reference OnPolicyBuffer reward_norm/reward_clip).

    # ---- pure functions ----

    def _ovm_velocity(self, h: jax.Array) -> jax.Array:
        c = self.cfg
        span = c.h_go - c.h_st
        mid = 0.5 * c.v_max * (1.0 - jnp.cos(jnp.pi * (h - c.h_st) / span))
        return jnp.where(h < c.h_st, 0.0, jnp.where(h > c.h_go, c.v_max, mid))

    def reset_with_noise(self, noise_h: jax.Array, noise_v: jax.Array
                         ) -> Tuple[CACCState, jax.Array]:
        """Deterministic reset given explicit noise vectors [n] (for
        trajectory-parity tests; SURVEY.md Appendix C test 1)."""
        c = self.cfg
        n = c.n_vehicle
        if self.scenario == "catchup":
            h0 = jnp.full((n,), c.h_star) + noise_h
            h0 = h0.at[0].set(c.catchup_ratio * c.h_star + noise_h[0])
            v0 = jnp.full((n,), c.v_star) + noise_v
            v_lead = jnp.asarray(c.v_star, jnp.float32)
        else:  # slowdown
            h0 = jnp.full((n,), c.h_star) + noise_h
            v0 = jnp.full((n,), c.slowdown_v0) + noise_v
            v_lead = jnp.asarray(c.slowdown_v0, jnp.float32)
        state = CACCState(
            h=h0.astype(jnp.float32),
            v=jnp.clip(v0, 0.0, c.v_max).astype(jnp.float32),
            u=jnp.zeros((n,), jnp.float32),
            v_lead=v_lead,
            t=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
        )
        return state, self._obs(state)

    def reset(self, key: jax.Array) -> Tuple[CACCState, jax.Array]:
        c = self.cfg
        kh, kv = jax.random.split(key)
        nh = jax.random.uniform(kh, (c.n_vehicle,), minval=-1.0, maxval=1.0
                                ) * c.init_noise_h
        nv = jax.random.uniform(kv, (c.n_vehicle,), minval=-1.0, maxval=1.0
                                ) * c.init_noise_v
        return self.reset_with_noise(nh, nv)

    def _leader_velocity(self, t: jax.Array) -> jax.Array:
        """Leader speed at step t (reference scenario profiles [M])."""
        c = self.cfg
        if self.scenario == "catchup":
            return jnp.asarray(c.v_star, jnp.float32)
        # slowdown: linear ramp slowdown_v0 -> v_star over slowdown_t secs
        frac = jnp.clip(t.astype(jnp.float32) * c.dt / c.slowdown_t, 0.0, 1.0)
        return c.slowdown_v0 + (c.v_star - c.slowdown_v0) * frac

    def _v_target(self, t: jax.Array) -> jax.Array:
        """Velocity target the w_v cost (and obs v-error) is charged
        against at step t. cfg.v_target="fixed": constant v_star (the
        r1-r4 engine, and the naive reading of the reference reward [M]).
        "profile": the leader's scenario profile — for slow-down the
        30->15 ramp, which removes the ~-900k of UNAVOIDABLE ramp-tracking
        cost that otherwise makes crashing return-optimal (round-5 reward
        decomposition; the reference must do the equivalent for its
        teacher-free learners to prefer survival, SURVEY section 6 CACC
        row). Identical for catchup (leader cruises at v_star)."""
        if self.cfg.v_target == "fixed":
            return jnp.asarray(self.cfg.v_star, jnp.float32)
        return self._leader_velocity(t)

    def _obs(self, s: CACCState) -> jax.Array:
        c = self.cfg
        v_prev = jnp.concatenate([s.v_lead[None], s.v[:-1]])
        ob = jnp.stack([
            (s.v - self._v_target(s.t)) / c.v_star,
            (v_prev - s.v) / 5.0,
            (s.h - c.h_star) / c.h_star,
            s.u / c.u_max,
        ], axis=-1)
        return ob.astype(jnp.float32)

    def record(self, s: CACCState):
        """Per-step platoon series (reference CACCEnv output_data: headway
        / velocity / accel csv for eval plots)."""
        return {"headway": s.h, "velocity": s.v, "accel": s.u,
                "v_lead": s.v_lead}

    def greedy_action(self, s: CACCState) -> jax.Array:
        """Naive baseline controller (CLI evaluate --naive): every vehicle
        runs the full-gain OVM law (alpha, beta) = (0.5, 0.5) — classical
        non-learned adaptive cruise control under this action table."""
        return jnp.full((self.n_agent,), 3, jnp.int32)

    def controller_action(self, s: CACCState) -> jax.Array:
        """STRONGEST known hand controller (naive baseline of record and
        kickstart teacher).

        catchup, and any scenario under v_target="fixed": the full-gain
        OVM law — near-optimal there (its fixed-mode slow-down return
        -915k sits within 2% of the -895k unavoidable floor; round-5
        decomposition).

        slow-down under v_target="profile" (spec of record): the
        spacing-corrected one-step greedy — per vehicle, pick the gain
        pair whose next-step state minimizes the true cost with the
        velocity target corrected by the headway error
        (v_des = v_profile + k_h (h - h*), k_h = 5 from the round-5
        sweep). Survives noise-free at ~-4.3k raw vs the OVM law's
        -249k and the ~-30k crash-optimal return, which is what makes
        survival return-preferred and the naive bar honest
        (scripts/cacc_reward_decompose.py)."""
        if self.scenario == "slowdown" and self.cfg.v_target == "profile":
            return self._spacing_greedy_action(s)
        return self.greedy_action(s)

    _SPACING_KH = 5.0   # headway->velocity correction gain (r5 sweep:
                        # 2-8 all survive, 5 is the flattest optimum for
                        # the non-sequential form)

    def _spacing_greedy_action(self, s: CACCState) -> jax.Array:
        """One-step-lookahead greedy over the 4-gain table, scored on the
        spacing-corrected next-step cost. The headway prediction uses the
        predecessor's CURRENT velocity (one joint vectorized pass; the
        sequential exact form scores within ~15% of it: -3.7k vs -4.3k
        noise-free)."""
        c = self.cfg
        v_prev = jnp.concatenate([s.v_lead[None], s.v[:-1]])
        gains = jnp.asarray(OVM_GAINS)                       # [4, 2]
        u = (gains[:, :1] * (self._ovm_velocity(s.h) - s.v)[None]
             + gains[:, 1:] * (v_prev - s.v)[None])          # [4, n]
        u = jnp.clip(u, -c.u_max, c.u_max)
        vn = jnp.clip(s.v[None] + c.dt * u, 0.0, c.v_max)
        hn = s.h[None] + c.dt * (v_prev[None] - vn)
        v_tgt = self._v_target(s.t + 1)
        v_des = v_tgt + self._SPACING_KH * (hn - c.h_star)
        score = (c.w_h * (hn - c.h_star) ** 2
                 + c.w_v * (vn - v_des) ** 2 + c.w_u * u ** 2)
        score = jnp.where(hn < c.h_min, jnp.inf, score)
        return jnp.argmin(score, axis=0).astype(jnp.int32)

    def step(self, s: CACCState, action: jax.Array
             ) -> Tuple[CACCState, jax.Array, jax.Array, jax.Array,
                        Dict[str, jax.Array]]:
        """One 0.1 s control step. action: [n] int32 in [0, 4)."""
        c = self.cfg
        gains = jnp.asarray(OVM_GAINS)[action]          # [n, 2]
        alpha, beta = gains[:, 0], gains[:, 1]
        v_prev = jnp.concatenate([s.v_lead[None], s.v[:-1]])
        u = alpha * (self._ovm_velocity(s.h) - s.v) + beta * (v_prev - s.v)
        u = jnp.clip(u, -c.u_max, c.u_max)
        v_new = jnp.clip(s.v + c.dt * u, 0.0, c.v_max)
        v_lead_new = self._leader_velocity(s.t + 1)
        v_prev_new = jnp.concatenate([v_lead_new[None], v_new[:-1]])
        # headway integrates the *new* relative speed (semi-implicit Euler,
        # reference cacc_env.py step [M])
        h_new = s.h + c.dt * (v_prev_new - v_new)
        collision = jnp.min(h_new) < c.h_min
        t_new = s.t + 1
        horizon = t_new >= c.episode_length
        done = collision | horizon

        v_tgt = self._v_target(t_new)
        cost = (c.w_h * (h_new - c.h_star) ** 2
                + c.w_v * (v_new - v_tgt) ** 2
                + c.w_u * u ** 2)
        reward = jnp.where(collision, -c.collision_penalty, -cost)

        s_new = CACCState(h=h_new, v=v_new, u=u, v_lead=v_lead_new,
                          t=t_new, done=done)
        info = {"collision": collision,
                "headway_err": jnp.mean(jnp.abs(h_new - c.h_star)),
                "velocity_err": jnp.mean(jnp.abs(v_new - v_tgt))}
        return s_new, self._obs(s_new), reward.astype(jnp.float32), done, info
