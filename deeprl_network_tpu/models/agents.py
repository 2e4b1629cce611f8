"""Reference-style stateful agent API (compat layer).

The reference L3 surface (agents/models.py; SURVEY.md section 1 L4->L3):

    model = MA2C_NC(n_s_ls, n_a_ls, neighbor_mask, distance_mask,
                    coop_gamma, total_step, model_config, seed)
    actions = model.forward(obs, done)            # or out_type='v'/'p'
    model.add_transition(ob, action, reward, value, done)
    model.backward(R, dt)
    model.reset(); model.save(path, step); model.load(path)

This module reproduces that object API on top of the functional core, so
code written against the reference ports mechanically. It exists for
interop and for host-driven external envs; the fused on-device path
(utils/rollout.make_a2c) is the fast path and the one the Trainer uses.

Each class name matches the reference exactly: IA2C, IA2C_FP, IA2C_CU,
MA2C_NC, MA2C_CNET, MA2C_DIAL.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeprl_network_tpu.config import ModelConfig
from deeprl_network_tpu.models.a2c import (
    Rollout, a2c_loss, normalize_rewards, nstep_returns, spatial_mix,
)
from deeprl_network_tpu.models.layers import tf1_rmsprop
from deeprl_network_tpu.models.policies import (
    AGENT_TO_COMM, PolicySpec, consensus_update, init_carry,
    init_fingerprint, init_policy_params, mask_comm_params, policy_step,
)
from deeprl_network_tpu.utils.checkpoint import CheckpointManager
from deeprl_network_tpu.utils.scheduler import make_schedule


class _BaseAgent:
    agent_name = "ia2c"

    def __init__(self, n_s_ls: Sequence[int], n_a_ls: Sequence[int],
                 neighbor_mask: np.ndarray, distance_mask: np.ndarray,
                 coop_gamma: float, total_step: int,
                 model_config: Optional[ModelConfig] = None, seed: int = 0):
        mcfg = model_config or ModelConfig()
        self.mcfg = mcfg
        n = len(n_s_ls)
        self.n_agent = n
        self.n_s_ls = tuple(n_s_ls)
        self.n_a_ls = tuple(n_a_ls)
        self.n_step = mcfg.n_step
        amask = np.zeros((n, max(n_a_ls)), np.float32)
        for i, na in enumerate(n_a_ls):
            amask[i, :na] = 1.0
        self.obs_mask = np.zeros((n, max(n_s_ls)), np.float32)
        for i, ns in enumerate(n_s_ls):
            self.obs_mask[i, :ns] = 1.0
        self.spec = PolicySpec(
            n_agent=n, n_s_max=max(n_s_ls), n_a_max=max(n_a_ls),
            n_fc=mcfg.num_fc, n_lstm=mcfg.num_lstm,
            comm_type=AGENT_TO_COMM[self.agent_name], n_msg=mcfg.num_fc,
            neighbor_mask=neighbor_mask.astype(np.float32),
            action_mask=amask)
        self.neighbor_mask = neighbor_mask
        if coop_gamma < 0:
            D = np.ones((n, n), np.float32)
        else:
            D = np.power(coop_gamma, distance_mask.astype(np.float32))
        self._D = jnp.asarray(D.astype(np.float32))
        self.key = jax.random.key(seed)
        self.key, k = jax.random.split(self.key)
        self.params = init_policy_params(k, self.spec)
        # optax calls the schedule with the UPDATE count; one backward()
        # consumes n_step env steps, so convert (as rollout.make_a2c does)
        _lr_env = make_schedule(mcfg.lr_decay, mcfg.lr_init, total_step,
                                mcfg.lr_min)
        self.optimizer = tf1_rmsprop(
            lambda count: _lr_env(count * mcfg.n_step),
            decay=mcfg.rmsp_alpha, eps=mcfg.rmsp_epsilon,
            max_grad_norm=mcfg.max_grad_norm)
        self.opt_state = self.optimizer.init(self.params)
        self._ent_sched = make_schedule(
            mcfg.entropy_decay, mcfg.entropy_coef, total_step,
            ratio=mcfg.entropy_ratio)
        self.cur_step = 0
        self._step_jit = jax.jit(
            lambda p, c, o, f, d: policy_step(
                self.spec, mask_comm_params(self.spec, p), c, o, f, d))
        self._update_jit = jax.jit(self._update)
        self.reset()
        self._buffer: List[dict] = []

    # ---- reference API ----

    def reset(self) -> None:
        self.carry = init_carry(self.spec)
        self.fp = init_fingerprint(self.spec)
        self._init_carry = self.carry
        self._prev_done = 1.0
        self._buffer = []

    def forward(self, obs, done, out_type: str = "p"):
        """obs: list of per-agent arrays (ragged) or [N, n_s_max]; done:
        scalar bool for the synchronized multi-agent episode.

        out_type 'p': sample actions (returns [N] ints and caches value);
        'v': return values only (bootstrap); 'pv': (actions, values).
        """
        ob = self._pack_obs(obs)
        d = jnp.asarray(float(done))
        if out_type == "v":
            _, _, value = self._step_jit(self.params, self.carry, ob,
                                         self.fp, d)
            return np.asarray(value)
        new_carry, logits, value = self._step_jit(self.params, self.carry,
                                                  ob, self.fp, d)
        self._pending = dict(ob=ob, fp=self.fp, prev_done=float(done),
                             value=np.asarray(value))
        self.carry = new_carry
        self.fp = jax.nn.softmax(logits, -1)
        self.key, k = jax.random.split(self.key)
        action = np.asarray(jax.random.categorical(k, logits))
        self._pending["action"] = action
        if out_type == "pv":
            return action, np.asarray(value)
        return action

    def get_policy(self) -> np.ndarray:
        """Latest per-agent softmax (for env.update_fingerprint parity)."""
        return np.asarray(self.fp)

    def add_transition(self, ob, action, reward, value, done) -> None:
        p = dict(self._pending)
        p["reward"] = np.asarray(reward, np.float32)
        p["done"] = float(done)
        self._buffer.append(p)
        if done:
            self.fp = init_fingerprint(self.spec)

    def backward(self, R, dt=None, summary_writer=None) -> dict:
        """R: bootstrap values [N] (0 if terminal). Consumes the buffer."""
        b = self._buffer
        obs = jnp.stack([t["ob"] for t in b])
        fps = jnp.stack([t["fp"] for t in b])
        prev_dones = jnp.asarray([t["prev_done"] for t in b], jnp.float32)
        actions = jnp.asarray(np.stack([t["action"] for t in b]))
        rewards = jnp.asarray(np.stack([t["reward"] for t in b]))
        values = jnp.asarray(np.stack([t["value"] for t in b]))
        dones = jnp.asarray([t["done"] for t in b], jnp.float32)
        (self.params, self.opt_state, stats) = self._update_jit(
            self.params, self.opt_state, self._init_carry, obs, fps,
            prev_dones, actions, rewards, values, dones,
            jnp.asarray(R, jnp.float32), jnp.asarray(self.cur_step))
        self.cur_step += len(b)
        self._buffer = []
        self._init_carry = self.carry
        return {k: float(v) for k, v in stats._asdict().items()}

    def _update(self, params, opt_state, init_c, obs, fps, prev_dones,
                actions, rewards, values, dones, R_boot, step):
        m = self.mcfg
        r = normalize_rewards(rewards, m.reward_norm, m.reward_clip)
        r = spatial_mix(r, self._D)
        returns = nstep_returns(r, dones, R_boot, m.gamma)
        advs = returns - values
        beta = self._ent_sched(step)

        def loss_fn(p):
            p = mask_comm_params(self.spec, p)
            roll = Rollout(obs=obs, fps=fps, prev_dones=prev_dones,
                           actions=actions, rewards=rewards, values=values,
                           dones=dones)
            return a2c_loss(self.spec, p, init_c, roll, returns, advs,
                            beta, m.value_coef)

        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if self.agent_name == "ia2c_cu":
            if self.mcfg.consensus_masked:
                params = consensus_update(params, self.neighbor_mask,
                                          self.spec.action_mask,
                                          self.obs_mask)
            else:
                params = consensus_update(params, self.neighbor_mask)
        return params, opt_state, stats

    def save(self, model_dir: str, step: Optional[int] = None) -> None:
        CheckpointManager(model_dir).save(step or self.cur_step,
                                          {"params": self.params,
                                           "opt_state": self.opt_state})

    def load(self, model_dir: str, checkpoint: Optional[int] = None) -> bool:
        m = CheckpointManager(model_dir)
        out = m.restore({"params": self.params,
                         "opt_state": self.opt_state}, checkpoint)
        if out is None:
            return False
        self.params = out["params"]
        self.opt_state = out["opt_state"]
        return True

    def _pack_obs(self, obs) -> jnp.ndarray:
        if isinstance(obs, (list, tuple)):
            out = np.zeros((self.n_agent, self.spec.n_s_max), np.float32)
            for i, o in enumerate(obs):
                o = np.asarray(o, np.float32).ravel()
                out[i, :len(o)] = o
            return jnp.asarray(out)
        return jnp.asarray(obs, jnp.float32)


class IA2C(_BaseAgent):
    agent_name = "ia2c"


class IA2C_FP(_BaseAgent):
    agent_name = "ia2c_fp"


class IA2C_CU(_BaseAgent):
    agent_name = "ia2c_cu"


class MA2C_NC(_BaseAgent):
    agent_name = "ma2c_nc"


class MA2C_CNET(_BaseAgent):
    agent_name = "ma2c_cnet"


class MA2C_DIAL(_BaseAgent):
    agent_name = "ma2c_dial"
