"""Fused on-device A2C actor-learner step.

The reference hot loop (SURVEY.md call stack 3.1: Trainer.explore's n_step
python loop of sess.run forward + TraCI env.step + buffer append, then
model.backward's BPTT sess.run) collapses here into ONE jitted function:

    train_step(ts) -> (ts', metrics)

which scans T = n_step control steps of B vmapped env instances (policy
forward, action sampling, env dynamics, fingerprint update, auto-reset),
computes normalized + spatially-discounted n-step returns, replays the
window for truncated BPTT, and applies the TF1-semantics RMSProp update —
all without leaving the device. Data-parallel scale-out wraps this same
function in ``shard_map`` with ``axis_name`` set, adding one grad ``pmean``
over the mesh (see parallel/train.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from deeprl_network_tpu.config import ModelConfig, TrainConfig
from deeprl_network_tpu.envs.wrappers import AutoResetEnv
from deeprl_network_tpu.models.a2c import (
    Rollout, a2c_loss, a2c_loss_terms, action_stats, normalize_rewards,
    nstep_returns, spatial_mix,
)
from deeprl_network_tpu.models.layers import tf1_rmsprop
from deeprl_network_tpu.models.policies import (
    AGENT_TO_COMM, Carry, PolicyParams, PolicySpec, consensus_update,
    init_carry, init_fingerprint, init_policy_params, mask_comm_params,
)
from deeprl_network_tpu.utils.scheduler import make_schedule

# default unroll factor for the T-step rollout scan (override per run
# via ModelConfig.scan_unroll). Measured on TPU v5e f32: >1 multiplies
# XLA compile time by minutes (the body contains the full env step +
# policy) for marginal steady-state gain — throughput is better bought
# with a larger env batch B. Keep 1.
_ROLLOUT_UNROLL = 1


@struct.dataclass
class TrainState:
    params: PolicyParams
    opt_state: Any
    env_state: Any            # AutoResetState, batched [B]
    obs: jax.Array            # [B, N, n_s_max]
    fp: jax.Array             # [B, N, n_a_max]
    carry: Carry              # [B, N, n_lstm] x2
    prev_done: jax.Array      # [B]
    key: jax.Array
    step: jax.Array           # global env-step counter (int64-ish int32)
    # episode-return bookkeeping (global reward = sum over agents)
    ep_ret: jax.Array         # [B] running episode return
    ep_len: jax.Array         # [B]
    last_ep_ret: jax.Array    # [B] most recent completed episode return
    last_ep_len: jax.Array    # [B]


def make_policy_spec(env_spec, mcfg: ModelConfig, agent: str) -> PolicySpec:
    return PolicySpec(
        n_agent=env_spec.n_agent,
        n_s_max=env_spec.n_s_max,
        n_a_max=env_spec.n_a_max,
        n_fc=mcfg.num_fc,
        n_lstm=mcfg.num_lstm,
        comm_type=AGENT_TO_COMM[agent],
        n_msg=mcfg.num_fc,
        sparse_comm=mcfg.sparse_comm,
        neighbor_obs=mcfg.neighbor_obs,
        obs_alpha=(env_spec.coop_gamma if env_spec.coop_gamma >= 0 else 1.0),
        neighbor_mask=env_spec.neighbor_mask,
        action_mask=env_spec.action_mask,
    )


class A2CFns(NamedTuple):
    init_state: Callable[..., TrainState]
    train_step: Callable[[TrainState], Tuple[TrainState, Dict[str, jax.Array]]]
    eval_episode: Callable[..., Dict[str, jax.Array]]
    record_episode: Callable[..., Dict[str, jax.Array]]
    spec: PolicySpec
    optimizer: optax.GradientTransformation
    steps_per_update: int = 0  # global env steps one train_step consumes
                               # (T x B x replicas) — static, so the host
                               # loop can count steps without device syncs


def make_a2c(env, mcfg: ModelConfig, tcfg: TrainConfig, agent: str = "ia2c",
             num_envs: Optional[int] = None, axis_name: Optional[str] = None,
             n_replicas: int = 1, jit: bool = True) -> A2CFns:
    """Build the fused A2C functions for one env family + algorithm.

    ``axis_name``: if set, gradients/metrics are reduced over that mesh
    axis (the function must then be called inside shard_map/pmap), and
    ``n_replicas`` must give the mesh-axis size so step counting and the
    lr/entropy schedules advance by GLOBAL env steps.
    """
    wenv = AutoResetEnv(env)
    spec = make_policy_spec(env.spec, mcfg, agent)
    n_env = num_envs or mcfg.num_envs
    T = mcfg.n_step
    if T % 8 != 0:
        import warnings
        warnings.warn(
            f"batch_size (n_step) = {T} is not a multiple of 8; unaligned "
            f"scan outputs measurably blow up XLA-TPU compile time "
            f"(60 -> >10min vs 120 -> ~100s on v5e). Prefer a multiple "
            f"of 8.", stacklevel=2)
    consensus = agent == "ia2c_cu"
    unroll = max(int(getattr(mcfg, "scan_unroll", _ROLLOUT_UNROLL)), 1)
    D = env.spec.spatial_discount()
    gamma = mcfg.gamma
    # one optimizer update consumes T steps x B envs x replicas GLOBAL
    # env steps — schedules are defined over global steps (total_step)
    steps_per_update = T * n_env * n_replicas
    lr_env_sched = make_schedule(mcfg.lr_decay, mcfg.lr_init,
                                 tcfg.total_step, mcfg.lr_min)
    ent_sched = make_schedule(mcfg.entropy_decay, mcfg.entropy_coef,
                              tcfg.total_step, ratio=mcfg.entropy_ratio)
    optimizer = tf1_rmsprop(
        lambda count: lr_env_sched(count * steps_per_update),
        decay=mcfg.rmsp_alpha, eps=mcfg.rmsp_epsilon,
        max_grad_norm=mcfg.max_grad_norm)

    cdt = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else jnp.float32
    if cdt != jnp.float32 and not mcfg.fused_grad:
        raise ValueError("compute_dtype=bfloat16 is supported on the "
                         "default fused-gradient path only")
    # training-only reward shaping / kickstarting (see ModelConfig)
    from deeprl_network_tpu.envs.base import Env as _BaseEnv
    use_shaping = mcfg.switch_penalty > 0
    use_kick = mcfg.kickstart_coef > 0
    if (use_shaping or use_kick) and not mcfg.fused_grad:
        raise ValueError("switch_penalty / kickstart_coef are supported "
                         "on the default fused-gradient path only")
    if use_shaping and type(env).prev_action is _BaseEnv.prev_action:
        raise ValueError(f"switch_penalty needs {type(env).__name__}."
                         "prev_action (ATSC envs only)")
    if use_kick and (type(env).controller_action
                     is _BaseEnv.controller_action):
        raise ValueError(f"kickstart_coef needs {type(env).__name__}."
                         "controller_action (implemented by the ATSC "
                         "envs — hysteresis — and CACC — fixed-gain OVM)")
    kick_horizon = max(mcfg.kickstart_ratio * tcfg.total_step, 1.0)

    def _prep_params(params):
        """Masked (+ cast) params for the hot path: mask ONCE per call,
        cast to the compute dtype (f32 master params stay in TrainState;
        grads of the cast flow back to f32)."""
        p = mask_comm_params(spec, params)
        if cdt != jnp.float32:
            p = jax.tree.map(lambda x: x.astype(cdt), p)
        return p

    def pstep(params, carry, obs, fp, done):
        from deeprl_network_tpu.models.policies import policy_step
        # cast inputs to the PARAMS' dtype, not the configured compute
        # dtype: eval/record paths keep f32 params (mask_comm_params, not
        # _prep_params), and casting their inputs to bf16 would lose input
        # precision with no compute benefit (ADVICE round 2)
        pdt = params.w_obs.w.dtype
        carry2, logits, values = policy_step(
            spec, params, carry, obs.astype(pdt), fp.astype(pdt), done)
        return (carry2, logits.astype(jnp.float32),
                values.astype(jnp.float32))

    if mcfg.use_pallas:
        from deeprl_network_tpu.models.policies import policy_step_batched
        _interp = jax.default_backend() != "tpu"

        def vpstep(params, carry, obs, fp, done):
            # same input-cast rule as pstep: follow the PARAMS' dtype so
            # a promoted-f32 embedding never changes the carry dtype
            # across the scan (bf16 train vs f32 eval params)
            pdt = params.w_obs.w.dtype
            carry = jax.tree.map(lambda t: t.astype(pdt), carry)
            carry2, logits, values = policy_step_batched(
                spec, params, carry, obs.astype(pdt), fp.astype(pdt),
                done, interpret=_interp)
            return (carry2, logits.astype(jnp.float32),
                    values.astype(jnp.float32))
    else:
        vpstep = jax.vmap(pstep, in_axes=(None, 0, 0, 0, 0))

    def init_state(key: jax.Array, params: Optional[PolicyParams] = None,
                   env_offset=0) -> TrainState:
        # store keys in raw uint32[2] form: rank-1 leaves shard cleanly
        # under shard_map (typed rank-0 key arrays cannot take a
        # PartitionSpec axis). Every env gets its OWN stream, derived by
        # fold_in on its GLOBAL index (env_offset + local index): the
        # same global batch then produces bit-identical trajectories on
        # any mesh size (tests/test_parallel.py DP-equivalence).
        key = _raw_key(key)
        k_param, k_env, k_run = jax.random.split(key, 3)
        if params is None:
            params = init_policy_params(k_param, spec)
        opt_state = optimizer.init(params)
        idx = env_offset + jnp.arange(n_env)
        fold = jax.vmap(jax.random.fold_in, in_axes=(None, 0))
        env_state, obs = jax.vmap(wenv.reset)(fold(k_env, idx))
        run_keys = fold(k_run, idx)                    # [B, 2] raw
        carry = jax.tree.map(
            lambda x: jnp.zeros((n_env,) + x.shape, x.dtype),
            init_carry(spec, dtype=cdt))
        fp = jnp.tile(init_fingerprint(spec)[None],
                      (n_env, 1, 1))
        return TrainState(
            params=params, opt_state=opt_state, env_state=env_state,
            obs=obs, fp=fp, carry=carry,
            prev_done=jnp.ones((n_env,), jnp.float32),
            key=run_keys, step=jnp.zeros((), jnp.int32),
            ep_ret=jnp.zeros((n_env,), jnp.float32),
            ep_len=jnp.zeros((n_env,), jnp.float32),
            last_ep_ret=jnp.zeros((n_env,), jnp.float32),
            last_ep_len=jnp.zeros((n_env,), jnp.float32))

    uniform_fp = init_fingerprint(spec)

    def _split_env_keys(keys):
        """[B, 2] raw per-env keys -> (advanced keys, action keys)."""
        ks = jax.vmap(jax.random.split)(keys)          # [B, 2, 2]
        return ks[:, 0], ks[:, 1]

    def _env_policy_step(mparams, state, sg=None):
        """The ONE rollout step both gradient paths share: policy forward,
        per-env action sampling, env step + auto-reset, fingerprint
        refresh, episode bookkeeping. ``sg`` (stop_gradient) marks the
        quantities the fused path treats as recorded constants; None for
        the no-gradient replay rollout."""
        (env_state, obs, fp, lcarry, prev_done, key,
         ep_ret, ep_len, last_ret, last_len) = state
        key, k_act = _split_env_keys(key)
        lcarry2, logits, values = vpstep(mparams, lcarry, obs, fp,
                                         prev_done)
        actions = jax.vmap(jax.random.categorical)(k_act, logits)  # [B, N]
        new_fp = jax.nn.softmax(logits, axis=-1)
        env_state2, obs2, reward, done, info = jax.vmap(wenv.step)(
            env_state, actions)
        if sg is not None:
            new_fp, obs2, reward = sg(new_fp), sg(obs2), sg(reward)
        done_f = done.astype(jnp.float32)
        # fingerprints reset to uniform on episode start
        new_fp = jnp.where(done_f[:, None, None], uniform_fp[None], new_fp)
        ep_ret2 = ep_ret + reward.sum(-1)
        ep_len2 = ep_len + 1.0
        last_ret2 = jnp.where(done_f > 0, ep_ret2, last_ret)
        last_len2 = jnp.where(done_f > 0, ep_len2, last_len)
        ep_ret2 = ep_ret2 * (1.0 - done_f)
        ep_len2 = ep_len2 * (1.0 - done_f)
        new_state = (env_state2, obs2, new_fp, lcarry2, done_f, key,
                     ep_ret2, ep_len2, last_ret2, last_len2)
        rec = {"obs": obs, "fp": fp, "prev_done": prev_done,
               "actions": actions, "logits": logits, "values": values,
               "reward": reward, "done_f": done_f, "info": info}
        # training-only signals from the PRE-step env state (the phase
        # showing while a_t was chosen / the state the teacher scores).
        # Episode bookkeeping and eval stay on the TRUE reward.
        rec["train_reward"] = reward
        if use_shaping:
            prev_a = env.prev_action(env_state.env)        # [B, N]
            switched = (actions != prev_a).astype(jnp.float32)
            rec["train_reward"] = (reward
                                   - mcfg.switch_penalty * switched)
        if use_kick:
            teacher = jax.vmap(env.controller_action)(env_state.env)
            logp = jax.nn.log_softmax(rec["logits"], axis=-1)
            rec["teacher_ce"] = -jnp.take_along_axis(
                logp, teacher[..., None], axis=-1)[..., 0]  # [B, N]
        return new_state, rec

    def rollout_body(carry_in, _):
        params, state = carry_in[0], carry_in[1:]
        new_state, r = _env_policy_step(params, state)
        out = (r["obs"], r["fp"], r["prev_done"], r["actions"],
               r["reward"], r["values"], r["done_f"], r["info"])
        return (params,) + new_state, out

    def _returns_pipeline(rew_seq, done_seq, v_boot):
        """normalize -> spatial mix -> n-step returns ([T, B, N] in/out)."""
        r = normalize_rewards(rew_seq, mcfg.reward_norm, mcfg.reward_clip)
        r = spatial_mix(r, jnp.asarray(D))
        return jax.vmap(nstep_returns, in_axes=(1, 1, 0, None),
                        out_axes=1)(r, done_seq, v_boot, gamma)

    def _replay_loss_and_grads(ts, beta):
        """Reference-structured two-pass update: rollout scan without
        gradients, then replay the T window for truncated BPTT (the
        explore/backward split of SURVEY.md call stacks 3.1/3.4)."""
        init_lcarry = ts.carry
        # mask per-edge comm blocks ONCE per update, outside the scans
        # (see mask_comm_params: avoids giant per-step masked residuals)
        mparams = mask_comm_params(spec, ts.params)
        carry0 = (mparams, ts.env_state, ts.obs, ts.fp, ts.carry,
                  ts.prev_done, ts.key, ts.ep_ret, ts.ep_len,
                  ts.last_ep_ret, ts.last_ep_len)
        carry1, outs = jax.lax.scan(rollout_body, carry0, None, length=T,
                                    unroll=unroll)
        (_, env_state, obs_f, fp_f, lcarry_f, done_f, key,
         ep_ret, ep_len, last_ret, last_len) = carry1
        (obs_seq, fp_seq, pdone_seq, act_seq, rew_seq, val_seq, done_seq,
         info_seq) = outs
        # time-major [T, B, ...] -> env-major [B, T, ...]
        to_b = lambda x: jnp.swapaxes(x, 0, 1)

        # bootstrap values V(s_T)
        _, _, v_boot = vpstep(mparams, lcarry_f, obs_f, fp_f, done_f)

        returns = _returns_pipeline(rew_seq, done_seq, v_boot)
        advs = returns - val_seq

        def batched_loss(params):
            params = mask_comm_params(spec, params)
            # a2c_loss only reads obs/fps/prev_dones/actions from Rollout;
            # rewards/values/dones slots are filled with placeholders.
            losses, stats = jax.vmap(
                lambda c, o, f, p, a, R, A: a2c_loss(
                    spec, params, c,
                    Rollout(obs=o, fps=f, prev_dones=p, actions=a,
                            rewards=R, values=R, dones=p),
                    R, A, beta, mcfg.value_coef, remat=mcfg.remat)
            )(init_lcarry, to_b(obs_seq), to_b(fp_seq), to_b(pdone_seq),
              to_b(act_seq), to_b(returns), to_b(advs))
            return jnp.mean(losses), jax.tree.map(jnp.mean, stats)

        (loss, stats), grads = jax.value_and_grad(batched_loss,
                                                  has_aux=True)(ts.params)
        new_core = (env_state, obs_f, fp_f, lcarry_f, done_f, key,
                    ep_ret, ep_len, last_ret, last_len)
        extra = {"step_reward": jnp.mean(rew_seq.sum(-1))}
        for k, v in info_seq.items():
            extra["env/" + k] = jnp.mean(v.astype(jnp.float32))
        return loss, stats, grads, new_core, extra

    def _fused_loss_and_grads(ts, beta, kick_w=0.0):
        """Single-pass update: differentiate through the rollout scan
        itself. Gradients flow through the LSTM carry chain exactly as in
        the replay (same truncated-BPTT window); everything the replay
        treats as recorded constants — obs, rewards, fingerprints, the
        bootstrap value — is stop_gradient'ed here, so the math is
        identical (tests/test_train.py::test_fused_grad_matches_replay)
        while the second T-step policy scan disappears."""

        def fused_loss(params):
            mparams = _prep_params(params)
            sg = jax.lax.stop_gradient

            def body(carry_in, _):
                new_state, r = _env_policy_step(mparams, carry_in, sg=sg)
                logp_a, entropy = action_stats(r["logits"], r["actions"])
                out = {"logp": logp_a, "ent": entropy, "val": r["values"],
                       "rew": sg(r["train_reward"]), "true_rew": r["reward"],
                       "done": r["done_f"], "info": r["info"]}
                if use_kick:
                    out["teacher_ce"] = r["teacher_ce"]
                return new_state, out

            if mcfg.remat:
                body = jax.checkpoint(body)
            carry0 = (ts.env_state, ts.obs, ts.fp, ts.carry, ts.prev_done,
                      ts.key, ts.ep_ret, ts.ep_len, ts.last_ep_ret,
                      ts.last_ep_len)
            carry1, outs = jax.lax.scan(body, carry0, None, length=T,
                                        unroll=unroll)
            (env_state, obs_f, fp_f, lcarry_f, done_f, key,
             ep_ret, ep_len, last_ret, last_len) = carry1
            val_seq, done_seq = outs["val"], outs["done"]

            _, _, v_boot = vpstep(mparams, lcarry_f, obs_f, fp_f, done_f)
            returns = _returns_pipeline(outs["rew"], done_seq, sg(v_boot))
            advs = returns - sg(val_seq)
            loss, stats = a2c_loss_terms(outs["logp"], outs["ent"],
                                         val_seq, returns, advs, beta,
                                         mcfg.value_coef)
            new_core = (env_state, obs_f, fp_f, lcarry_f, done_f, key,
                        ep_ret, ep_len, last_ret, last_len)
            extra = {"step_reward": jnp.mean(outs["true_rew"].sum(-1))}
            if use_kick:
                # CE toward the hand controller: mean per agent-step;
                # loss term follows the sum-over-agents convention
                ce = outs["teacher_ce"]
                loss = loss + kick_w * jnp.sum(jnp.mean(ce, (0, 1)))
                extra["kick_ce"] = jnp.mean(ce)
            for k, v in outs["info"].items():
                extra["env/" + k] = jnp.mean(v.astype(jnp.float32))
            return loss, (stats, new_core, extra)

        (loss, (stats, new_core, extra)), grads = jax.value_and_grad(
            fused_loss, has_aux=True)(ts.params)
        return loss, stats, grads, new_core, extra

    def train_step(ts: TrainState) -> Tuple[TrainState, Dict[str, jax.Array]]:
        beta = ent_sched(ts.step)
        if mcfg.fused_grad:
            # kickstart weight anneals linearly to 0 at
            # kickstart_ratio * total_step
            kick_w = mcfg.kickstart_coef * jnp.clip(
                1.0 - ts.step.astype(jnp.float32) / kick_horizon, 0.0, 1.0)
            loss, stats, grads, new_core, extra = _fused_loss_and_grads(
                ts, beta, kick_w)
        else:
            loss, stats, grads, new_core, extra = _replay_loss_and_grads(
                ts, beta)
        (env_state, obs_f, fp_f, lcarry_f, done_f, key,
         ep_ret, ep_len, last_ret, last_len) = new_core
        if axis_name is not None:
            # Under shard_map's varying-manual-axes semantics (jax>=0.9),
            # differentiating the per-device loss wrt the REPLICATED
            # params already inserts a psum over the mesh axis: grads
            # arrive as sum_d g_d, identical on every device (a pmean
            # here is an identity on identical values — it does NOT
            # divide). Normalize to the global batch mean explicitly.
            # tests/test_parallel.py::test_multi_device_update_equals_
            # single_device pins this: an N-device update must equal the
            # single-device update on the combined batch.
            n_rep = jax.lax.psum(1, axis_name)
            grads = jax.tree.map(lambda g: g / n_rep, grads)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        if consensus:
            if mcfg.consensus_masked:
                params = consensus_update(params, env.spec.neighbor_mask,
                                          env.spec.action_mask,
                                          env.spec.obs_mask)
            else:
                params = consensus_update(params, env.spec.neighbor_mask)

        new_ts = TrainState(
            params=params, opt_state=opt_state, env_state=env_state,
            obs=obs_f, fp=fp_f, carry=lcarry_f, prev_done=done_f, key=key,
            step=ts.step + steps_per_update,
            ep_ret=ep_ret, ep_len=ep_len,
            last_ep_ret=last_ret, last_ep_len=last_len)
        metrics = {
            "loss": loss,
            "policy_loss": stats.policy,
            "value_loss": stats.value,
            "entropy": stats.entropy,
            "grad_norm": grad_norm,
            "episode_return": jnp.mean(last_ret),
            "episode_len": jnp.mean(last_len),
            "lr": lr_env_sched(ts.step),
            "beta": beta,
            **extra,
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return new_ts, metrics

    def eval_episode(params: PolicyParams, key: jax.Array,
                     max_steps: Optional[int] = None, greedy: bool = False
                     ) -> Dict[str, jax.Array]:
        """One evaluation episode on a single env instance (reference
        Trainer.perform / Evaluator.run). Default is SAMPLED actions —
        the reference's evaluation protocol; argmax is much worse for
        these stochastic-mixing controllers (CLAUDE.md)."""
        horizon = max_steps or _default_horizon(env)
        params = mask_comm_params(spec, params)
        k_env, k_run = jax.random.split(key)
        state, obs = env.reset(k_env)
        carry = init_carry(spec)
        fp = init_fingerprint(spec)

        def body(c, _):
            state, obs, fp, carry, done_prev, key, ep_ret, alive = c
            key, k_act = jax.random.split(key)
            carry, logits, _ = pstep(params, carry, obs, fp, done_prev)
            if greedy:
                action = jnp.argmax(logits, -1)
            else:
                action = jax.random.categorical(k_act, logits)
            new_fp = jax.nn.softmax(logits, -1)
            state2, obs2, reward, done, info = env.step(state, action)
            ep_ret = ep_ret + reward.sum() * alive
            alive2 = alive * (1.0 - done.astype(jnp.float32))
            return ((state2, obs2, new_fp, carry, jnp.zeros(()), key,
                     ep_ret, alive2),
                    {"reward": reward.sum() * alive, "alive": alive, **{
                        k: v * alive for k, v in info.items()}})

        c0 = (state, obs, fp, carry, jnp.zeros(()), k_run,
              jnp.zeros(()), jnp.ones(()))
        cf, seq = jax.lax.scan(body, c0, None, length=horizon)
        ep_ret = cf[6]
        # average over EXECUTED steps: an early-terminating episode must
        # not have its per-step metrics diluted by the unexecuted tail
        ep_len = jnp.maximum(jnp.sum(seq["alive"]), 1.0)
        out = {"episode_return": ep_ret,
               "episode_len": jnp.sum(seq["alive"]),
               "avg_step_reward": ep_ret / ep_len}
        for k, v in seq.items():
            if k not in ("reward", "alive"):
                # per-step mean over any agent axes, then weighted by
                # executed steps only
                per_step = v.reshape(v.shape[0], -1).mean(-1)
                out["env/" + k] = jnp.sum(per_step) / ep_len
        return out

    def record_episode(params: Optional[PolicyParams], key: jax.Array,
                       max_steps: Optional[int] = None,
                       policy: str = "greedy") -> Dict[str, jax.Array]:
        """One episode with full per-step measurement series (reference
        Evaluator + env.init_data/output_data). policy: 'greedy' (argmax),
        'sample', or 'controller' (the env's STRONGEST built-in hand
        controller — queue-scored hysteresis for ATSC via
        env.controller_action, falling back to greedy_action; the
        reference naive_policy path, reported at the strongest form so
        the naive baseline is never under-stated; VERDICT r2 Weak #7)."""
        horizon = max_steps or _default_horizon(env)
        if params is not None:
            params = mask_comm_params(spec, params)
        k_env, k_run = jax.random.split(key)
        state, obs = env.reset(k_env)
        carry = init_carry(spec)
        fp = init_fingerprint(spec)

        def body(c, _):
            state, obs, fp, carry, key, alive = c
            key, k_act = jax.random.split(key)
            if policy == "controller":
                a = env.controller_action(state)
                action = a if a is not None else env.greedy_action(state)
                new_fp = fp
            else:
                carry, logits, _ = pstep(params, carry, obs, fp,
                                         jnp.zeros(()))
                action = (jnp.argmax(logits, -1) if policy == "greedy"
                          else jax.random.categorical(k_act, logits))
                new_fp = jax.nn.softmax(logits, -1)
            state2, obs2, reward, done, info = env.step(state, action)
            out = {"action": action, "reward": reward, "alive": alive,
                   **env.record(state2), **info}
            alive2 = alive * (1.0 - done.astype(jnp.float32))
            return (state2, obs2, new_fp, carry, key, alive2), out

        c0 = (state, obs, fp, carry, k_run, jnp.ones(()))
        _, seq = jax.lax.scan(body, c0, None, length=horizon)
        return seq

    if jit:
        train_step = jax.jit(train_step, donate_argnums=0)
        eval_episode = jax.jit(eval_episode, static_argnums=(2, 3))
        record_episode = jax.jit(record_episode, static_argnums=(2, 3))
    return A2CFns(init_state=init_state, train_step=train_step,
                  eval_episode=eval_episode, record_episode=record_episode,
                  spec=spec, optimizer=optimizer,
                  steps_per_update=steps_per_update)


def _raw_key(key: jax.Array) -> jax.Array:
    """Typed PRNG key -> raw uint32[2] (no-op if already raw)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(key)
    return key


def _default_horizon(env) -> int:
    cfg = getattr(env, "cfg", None)
    if cfg is not None:
        if cfg.scenario.startswith("cacc"):
            return int(cfg.episode_length)
        return int(cfg.episode_steps_atsc)
    return 600
