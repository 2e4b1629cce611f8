"""A2C math: n-step returns, spatial reward discounting, joint loss.

TPU-native counterpart of the reference return/advantage/loss pipeline
(agents/utils.py OnPolicyBuffer.sample_transition ~L110,
MultiAgentOnPolicyBuffer ~L160, agents/policies.py Policy.prepare_loss
~L10; SURVEY.md Appendix A — spec of record):

- returns: R_t = r_t + gamma (1 - done_t) R_{t+1}, bootstrap R_T = V(s_T);
  Adv_t = R_t - V(s_t); realized as a reverse ``lax.scan``.
- reward normalization/clip (reference OnPolicyBuffer.add_transition):
  r <- clip(r / reward_norm, +-reward_clip), applied BEFORE spatial mixing.
- spatial discounting (MA2C family): r_tilde = D @ r with
  D_ij = coop_gamma^d(i,j) (or all-ones when coop_gamma < 0 ==> global
  reward for every agent).
- loss per agent: L = -sum_t log pi(a_t|s_t) Adv_t
                      + 0.5 value_coef sum_t (R_t - V_t)^2
                      - beta sum_t H(pi_t),
  summed over agents, averaged over time (and env batch). The backward
  pass replays the policy over the T-step window from the stored initial
  LSTM carry — the same truncated-BPTT-with-recompute the reference's
  ``policy.backward`` does via its unrolled TF graph.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from deeprl_network_tpu.models.policies import (
    Carry, PolicyParams, PolicySpec, policy_step,
)


class Rollout(NamedTuple):
    """One T-step window for a single env instance (add leading axes by
    vmapping). Time-major; shapes given for [T] window, N agents."""

    obs: jax.Array        # [T, N, n_s_max]
    fps: jax.Array        # [T, N, n_a_max] fingerprints fed at each step
    prev_dones: jax.Array # [T] done flag preceding each step (resets carry)
    actions: jax.Array    # [T, N] int32
    rewards: jax.Array    # [T, N] raw env rewards
    values: jax.Array     # [T, N] V(s_t) from the rollout policy
    dones: jax.Array      # [T] done AFTER each step


def normalize_rewards(r: jax.Array, reward_norm: float,
                      reward_clip: float) -> jax.Array:
    if reward_norm and reward_norm > 0:
        r = r / reward_norm
    if reward_clip and reward_clip > 0:
        r = jnp.clip(r, -reward_clip, reward_clip)
    return r


def spatial_mix(r: jax.Array, discount_matrix: jax.Array) -> jax.Array:
    """r_tilde[..., i] = sum_j D[i, j] r[..., j]."""
    return jnp.einsum("ij,...j->...i", discount_matrix, r)


def nstep_returns(rewards: jax.Array, dones: jax.Array,
                  bootstrap: jax.Array, gamma: float) -> jax.Array:
    """rewards [T, N], dones [T], bootstrap V [N] -> returns [T, N]."""

    def body(R, x):
        r_t, done_t = x
        R = r_t + gamma * (1.0 - done_t) * R
        return R, R

    _, Rs = jax.lax.scan(body, bootstrap,
                         (rewards, dones.astype(rewards.dtype)),
                         reverse=True)
    return Rs


class LossStats(NamedTuple):
    total: jax.Array
    policy: jax.Array
    value: jax.Array
    entropy: jax.Array


def action_stats(logits: jax.Array, actions: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
    """log pi(a|s) of the taken action and nan-safe entropy.

    logits [..., A] (padded actions at ~-1e9), actions [...] int ->
    (logp_a [...], entropy [...]).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(logp)
    logp_a = jnp.take_along_axis(logp, actions[..., None], axis=-1)[..., 0]
    # entropy over valid actions only: padded logits ~ -1e9 => p ~ 0,
    # p*logp -> 0 * -1e9 = nan-safe via where
    ent_terms = jnp.where(probs > 1e-8, probs * logp, 0.0)
    return logp_a, -jnp.sum(ent_terms, axis=-1)


def a2c_loss_terms(logp_a: jax.Array, entropy: jax.Array, values: jax.Array,
                   returns: jax.Array, advs: jax.Array,
                   entropy_coef: float | jax.Array, value_coef: float
                   ) -> Tuple[jax.Array, LossStats]:
    """Joint A2C loss from per-step policy statistics.

    All arrays [..., N]: mean over every leading axis (time, env batch),
    sum over the trailing agent axis — the reference's per-agent losses
    summed in one op (SURVEY.md Appendix A). advs/returns enter under
    stop_gradient; values carry the critic gradient.
    """
    lead = tuple(range(logp_a.ndim - 1))
    policy_loss = -jnp.sum(jnp.mean(
        logp_a * jax.lax.stop_gradient(advs), axis=lead))
    value_loss = jnp.sum(jnp.mean(
        0.5 * (jax.lax.stop_gradient(returns) - values) ** 2,
        axis=lead)) * value_coef
    mean_entropy = jnp.mean(entropy)  # RAW per-agent policy entropy —
    # reporting coef*H would read as "deterministic" whenever the
    # schedule anneals the coef, regardless of the actual policy
    entropy_loss = -jnp.sum(jnp.mean(entropy, axis=lead)) * entropy_coef
    total = policy_loss + value_loss + entropy_loss
    return total, LossStats(total, policy_loss, value_loss, mean_entropy)


def a2c_loss(spec: PolicySpec, params: PolicyParams, init_carry: Carry,
             roll: Rollout, returns: jax.Array, advs: jax.Array,
             entropy_coef: float | jax.Array, value_coef: float,
             remat: bool = False) -> Tuple[jax.Array, LossStats]:
    """Joint A2C loss for one env window; replays the policy over T steps
    (truncated BPTT from the stored initial carry). vmap over envs and
    mean the result.

    ``remat``: rematerialize the cell in the backward pass — without it
    XLA saves ~12 [T, B, N, H] activation tensors across the scan
    (measured OOM at B=1024 on a 16 GB chip); with it only the per-step
    carry survives, trading ~1.3x FLOPs for ~10x activation memory.
    Caveat (measured): jax.checkpoint inside the scan multiplies XLA-TPU
    compile time from ~30 s to many minutes — default off; enable via
    ModelConfig.remat only when B forces it.
    """

    def step(carry, x):
        ob, fp, pd = x
        carry, logits, value = policy_step(spec, params, carry, ob, fp, pd)
        return carry, (logits, value)

    if remat:
        step = jax.checkpoint(step)
    _, (logits, values) = jax.lax.scan(
        step, init_carry, (roll.obs, roll.fps,
                           roll.prev_dones.astype(roll.obs.dtype)))
    # logits [T, N, A], values [T, N]
    logp_a, entropy = action_stats(logits, roll.actions)
    return a2c_loss_terms(logp_a, entropy, values, returns, advs,
                          entropy_coef, value_coef)
