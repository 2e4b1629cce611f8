"""Multi-agent recurrent policies: the six reference algorithm families as
one LSTM cell with pluggable neighbor message passing.

TPU-native rebuild of the reference ``agents/policies.py`` (SURVEY.md
section 2.2 item 4 and Appendix A — spec of record). The reference builds,
per agent i, TF1 graphs that CONCATENATE variable-size neighbor inputs
(obs, fingerprints, hidden states) and multiply by one big weight matrix.
Concatenation over a static neighborhood is mathematically identical to a
sum of per-edge weight blocks:

    W @ concat(x_j for j in N(i))  ==  sum_j A[i,j] * (W_block[i,j] @ x_j)

so here every comm path is a dense masked einsum over stacked per-edge
block weights [N, N, d_in, d_out] — batched matmuls that map straight onto
the MXU, with the {0,1} adjacency as a static mask. Per-agent parameters
are stacked on a leading [N] axis and vmapped (SURVEY.md section 7 build
plan).

Family -> comm type (reference class in agents/policies.py):
- IA2C      -> CommType.NONE      (LstmPolicy, ~L80)
- IA2C_FP   -> CommType.FP        (FPPolicy, ~L170: obs + neighbor
                                   fingerprints, data-only / no grad path)
- IA2C_CU   -> CommType.NONE + :func:`consensus_update`
                                  (ConsensusPolicy, ~L300)
- MA2C_NC   -> CommType.NEURCOMM  (NCMultiAgentPolicy, ~L200:
    e_i = relu(Wx.concat(ob_i, fp_N(i)) + Wm.concat(h_N(i), t-1));
    gradients flow through neighbor h — differentiable comm)
- MA2C_CNET -> CommType.COMMNET   (CommNetMultiAgentPolicy, ~L340:
    shared linear map of the MEAN neighbor hidden state)
- MA2C_DIAL -> CommType.DIAL      (DIALMultiAgentPolicy, ~L380: learned
    per-agent message vectors delivered to neighbors, differentiable)

Heads (Policy base ~L10): pi_i = softmax(W_a[i] h_i) with -inf padding
mask for heterogeneous action counts; V_i = w_v[i] . h_i.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deeprl_network_tpu.models.layers import (
    FCParams, LSTMParams, fc_init, lstm_init, lstm_step, ortho_init,
)

BIG_NEG = -1e9


class CommType(str, enum.Enum):
    NONE = "none"
    FP = "fp"
    NEURCOMM = "neurcomm"
    COMMNET = "commnet"
    DIAL = "dial"


AGENT_TO_COMM = {
    "ia2c": CommType.NONE,
    "ia2c_fp": CommType.FP,
    "ia2c_cu": CommType.NONE,
    "ma2c_nc": CommType.NEURCOMM,
    "ma2c_cnet": CommType.COMMNET,
    "ma2c_dial": CommType.DIAL,
}


@dataclass(frozen=True)
class PolicySpec:
    """Static policy description; safe to close over under jit."""

    n_agent: int
    n_s_max: int
    n_a_max: int
    n_fc: int = 64
    n_lstm: int = 64
    comm_type: CommType = CommType.NONE
    n_msg: int = 64                      # DIAL message width
    # K-sparse message passing: pack per-edge weight blocks to the actual
    # neighbor lists [N, K=max_degree] instead of dense [N, N] einsums.
    # Same math (packing happens in mask_comm_params; equivalence tested),
    # ~N/K fewer comm FLOPs in the hot scan (6x on the 5x5 grid).
    sparse_comm: bool = False
    # alpha-scaled neighbor observations (reference envs/atsc_env.py
    # _get_state ~L340: MA2C variants additionally see neighbor obs scaled
    # by the spatial discount alpha = coop_gamma). The reference
    # concatenates them into the input; concat == per-edge block sum, so
    # here it is one more masked per-edge einsum on the embedding.
    neighbor_obs: bool = False
    obs_alpha: float = 1.0
    # numpy statics (excluded from eq/hash; never traced)
    neighbor_mask: Optional[np.ndarray] = field(default=None, hash=False,
                                                compare=False)
    action_mask: Optional[np.ndarray] = field(default=None, hash=False,
                                              compare=False)

    def adj(self) -> np.ndarray:
        a = self.neighbor_mask
        if a is None:
            a = np.zeros((self.n_agent, self.n_agent), np.float32)
        return a.astype(np.float32)

    def neighbor_lists(self) -> Tuple[np.ndarray, np.ndarray]:
        """(idx [N, K] int32, valid [N, K] float32): row i holds the
        neighbor indices of agent i padded to K = max degree (padded
        slots point at 0 and carry valid=0, so their packed weight blocks
        are zeroed and contribute nothing)."""
        adj = self.adj()
        k = max(int(adj.sum(1).max()), 1)
        idx = np.zeros((self.n_agent, k), np.int32)
        valid = np.zeros((self.n_agent, k), np.float32)
        for i in range(self.n_agent):
            nbrs = np.flatnonzero(adj[i])
            idx[i, :len(nbrs)] = nbrs
            valid[i, :len(nbrs)] = 1.0
        return idx, valid

    def logit_mask(self) -> np.ndarray:
        """Additive mask: 0 for valid actions, BIG_NEG for padding."""
        if self.action_mask is None:
            return np.zeros((self.n_agent, self.n_a_max), np.float32)
        return ((1.0 - self.action_mask) * BIG_NEG).astype(np.float32)


class PolicyParams(NamedTuple):
    w_obs: FCParams                 # [N] batched: n_s_max -> n_fc
    lstm: LSTMParams                # [N] batched: n_fc -> n_lstm
    actor: FCParams                 # [N] batched: n_lstm -> n_a_max
    critic: FCParams                # [N] batched: n_lstm -> 1
    w_fp: Optional[jax.Array]       # [N, N, n_a_max, n_fc] (FP/NEURCOMM)
    w_msg: Optional[jax.Array]      # NEURCOMM: [N,N,n_lstm,n_fc];
                                    # DIAL: [N,N,n_msg,n_fc];
                                    # COMMNET: [n_lstm, n_fc] shared
    w_dial: Optional[FCParams]      # [N] batched: n_lstm -> n_msg (DIAL)
    w_nobs: Optional[jax.Array] = None  # [N, N, n_s_max, n_fc]
                                    # (neighbor_obs: alpha-scaled
                                    # neighbor observations)


class Carry(NamedTuple):
    c: jax.Array  # [N, n_lstm]
    h: jax.Array  # [N, n_lstm]


def init_carry(spec: PolicySpec, dtype=jnp.float32) -> Carry:
    # distinct buffers: aliased leaves break XLA buffer donation
    return Carry(jnp.zeros((spec.n_agent, spec.n_lstm), dtype),
                 jnp.zeros((spec.n_agent, spec.n_lstm), dtype))


def init_fingerprint(spec: PolicySpec, dtype=jnp.float32) -> jax.Array:
    """Uniform policy fingerprints at episode start (reference Node.fingerprint
    init in envs/atsc_env.py ~L60)."""
    m = jnp.asarray(spec.action_mask if spec.action_mask is not None
                    else np.ones((spec.n_agent, spec.n_a_max), np.float32))
    return (m / jnp.sum(m, -1, keepdims=True)).astype(dtype)


def init_policy_params(key: jax.Array, spec: PolicySpec,
                       dtype=jnp.float32) -> PolicyParams:
    """Orthogonal init per block; per-edge blocks scaled by 1/sqrt(deg) so
    the summed message keeps the variance the reference's concat-ortho init
    gives (init detail, [M]; learning-curve equivalence is the target)."""
    n, s, a = spec.n_agent, spec.n_s_max, spec.n_a_max
    ks = jax.random.split(key, 8)
    adj = spec.adj()
    deg = np.maximum(adj.sum(1), 1.0)
    edge_scale = (1.0 / np.sqrt(deg))[:, None, None, None]

    w_obs = fc_init(ks[0], s, spec.n_fc, scale=np.sqrt(2.0),
                    batch_shape=(n,), dtype=dtype)
    lstm = lstm_init(ks[1], spec.n_fc, spec.n_lstm, scale=1.0,
                     batch_shape=(n,), dtype=dtype)
    actor = fc_init(ks[2], spec.n_lstm, a, scale=0.01,
                    batch_shape=(n,), dtype=dtype)
    critic = fc_init(ks[3], spec.n_lstm, 1, scale=1.0,
                     batch_shape=(n,), dtype=dtype)

    w_fp = w_msg = w_dial = w_nobs = None
    ct = spec.comm_type
    if spec.neighbor_obs:
        w_nobs = ortho_init(ks[7], (n, n, s, spec.n_fc), np.sqrt(2.0),
                            dtype) * edge_scale
    if ct in (CommType.FP, CommType.NEURCOMM):
        w_fp = ortho_init(ks[4], (n, n, a, spec.n_fc), np.sqrt(2.0),
                          dtype) * edge_scale
    if ct == CommType.NEURCOMM:
        w_msg = ortho_init(ks[5], (n, n, spec.n_lstm, spec.n_fc),
                           np.sqrt(2.0), dtype) * edge_scale
    elif ct == CommType.COMMNET:
        w_msg = ortho_init(ks[5], (spec.n_lstm, spec.n_fc),
                           np.sqrt(2.0), dtype)
    elif ct == CommType.DIAL:
        w_msg = ortho_init(ks[5], (n, n, spec.n_msg, spec.n_fc),
                           np.sqrt(2.0), dtype) * edge_scale
        w_dial = fc_init(ks[6], spec.n_lstm, spec.n_msg, scale=np.sqrt(2.0),
                         batch_shape=(n,), dtype=dtype)
    params = PolicyParams(w_obs, lstm, actor, critic, w_fp, w_msg, w_dial,
                          w_nobs)
    # non-edge blocks start (and stay) zero; see mask_comm_params. Stored
    # params are ALWAYS dense [N, N, ...] — sparse_comm packing happens
    # only at use time (mask_comm_params), never on the stored pytree.
    return _zero_nonedge_blocks(spec, params)


def _needs_edge_mask(spec: PolicySpec) -> bool:
    return spec.neighbor_mask is not None and (
        spec.comm_type is not CommType.NONE or spec.neighbor_obs)


def _zero_nonedge_blocks(spec: PolicySpec,
                         params: PolicyParams) -> PolicyParams:
    """Zero the dense [N, N, ...] comm blocks of non-edges (no packing)."""
    if not _needs_edge_mask(spec):
        return params
    adj = jnp.asarray(spec.adj())[:, :, None, None]
    w_fp = params.w_fp * adj if params.w_fp is not None else None
    w_nobs = params.w_nobs * adj if params.w_nobs is not None else None
    w_msg = params.w_msg
    if w_msg is not None and spec.comm_type in (CommType.NEURCOMM,
                                                CommType.DIAL):
        w_msg = w_msg * adj
    return params._replace(w_fp=w_fp, w_msg=w_msg, w_nobs=w_nobs)


def mask_comm_params(spec: PolicySpec, params: PolicyParams) -> PolicyParams:
    """Zero the per-edge weight blocks of non-edges.

    Masking here — ONCE per train/eval call, outside the T-step scan —
    instead of multiplying by the adjacency inside every policy_step keeps
    XLA from materializing a [T, B, N, N, H] masked-activation residual
    for the backward pass (measured: 9 GB at B=1024 on the 25-agent
    grid). Gradients flow through this mask, so non-edge blocks get zero
    gradient and never drift: phantom edges cannot form.
    """
    if not _needs_edge_mask(spec):
        return params
    if spec.sparse_comm:
        # pack dense [N, N, din, dout] blocks to the neighbor lists
        # [N, K, din, dout]: stored/checkpointed/consensus-averaged params
        # stay dense, policy_step consumes the packed form. The gather is
        # differentiable (transpose = scatter-add into the dense blocks).
        idx, valid = spec.neighbor_lists()
        idx_j, vm = jnp.asarray(idx), jnp.asarray(valid)[:, :, None, None]
        rows = jnp.arange(spec.n_agent)[:, None]
        pack = lambda w: w[rows, idx_j] * vm
        w_fp = pack(params.w_fp) if params.w_fp is not None else None
        w_nobs = pack(params.w_nobs) if params.w_nobs is not None else None
        w_msg = params.w_msg
        if w_msg is not None and spec.comm_type in (CommType.NEURCOMM,
                                                    CommType.DIAL):
            w_msg = pack(w_msg)
        return params._replace(w_fp=w_fp, w_msg=w_msg, w_nobs=w_nobs)
    return _zero_nonedge_blocks(spec, params)


def policy_step(spec: PolicySpec, params: PolicyParams, carry: Carry,
                obs: jax.Array, fp: jax.Array, done: jax.Array
                ) -> Tuple[Carry, jax.Array, jax.Array]:
    """One control step for all N agents of ONE env instance.

    obs: [N, n_s_max] zero-padded; fp: [N, n_a_max] neighbor fingerprints
    (previous-step policy probs — data, not a gradient path, matching the
    reference where fingerprints are numpy feeds); done: scalar in {0,1} —
    resets the LSTM carry (reference lstm done-masking).

    ``params`` must have passed :func:`mask_comm_params` (non-edge blocks
    zeroed); the per-edge einsums below then need no adjacency factor.

    Returns (new_carry, masked logits [N, n_a_max], values [N]).
    Batch over envs with ``jax.vmap`` (spec/params broadcast).
    """
    h_prev = carry.h * (1.0 - done).astype(carry.h.dtype)
    e = _embed(spec, params, h_prev, obs, fp)

    done_n = jnp.broadcast_to(done, (spec.n_agent,))
    new_carry, h = jax.vmap(lstm_step)(params.lstm, (carry.c, carry.h),
                                       e, done_n)
    logits = jnp.einsum("nh,nha->na", h, params.actor.w) + params.actor.b
    logits = logits + jnp.asarray(spec.logit_mask())
    value = (jnp.einsum("nh,nhv->nv", h, params.critic.w)
             + params.critic.b)[..., 0]
    return Carry(*new_carry), logits, value


def _embed(spec: PolicySpec, params: PolicyParams, h_prev: jax.Array,
           obs: jax.Array, fp: jax.Array) -> jax.Array:
    """Pre-LSTM input embedding for one env instance ([N, ...] arrays):
    own obs through the per-agent fc plus the comm-type message term."""
    sparse = spec.sparse_comm and spec.neighbor_mask is not None
    if sparse:
        idx = jnp.asarray(spec.neighbor_lists()[0])   # [N, K]

    # input embedding: own obs through per-agent fc
    e = jnp.einsum("ns,nsf->nf", obs, params.w_obs.w) + params.w_obs.b
    ct = spec.comm_type
    if spec.neighbor_obs:
        # alpha-scaled neighbor observations (reference _get_state ~L340:
        # the MA2C state concatenates coop_gamma-scaled neighbor obs;
        # concat == per-edge block sum, alpha multiplies into the input).
        # Data path only, like fingerprints.
        nobs = jax.lax.stop_gradient(obs) * spec.obs_alpha
        if sparse:  # packed [N, K, S, F]
            e = e + jnp.einsum("nks,nksf->nf", nobs[idx], params.w_nobs)
        else:
            e = e + jnp.einsum("ms,nmsf->nf", nobs, params.w_nobs)
    if ct in (CommType.FP, CommType.NEURCOMM):
        fp_in = jax.lax.stop_gradient(fp)
        if sparse:  # params.w_fp packed [N, K, A, F] by mask_comm_params
            e = e + jnp.einsum("nka,nkaf->nf", fp_in[idx], params.w_fp)
        else:
            e = e + jnp.einsum("ma,nmaf->nf", fp_in, params.w_fp)
    if ct == CommType.NEURCOMM:
        # differentiable comm: gradient flows into neighbors' h
        if sparse:  # packed [N, K, H, F]
            e = e + jnp.einsum("nkh,nkhf->nf", h_prev[idx], params.w_msg)
        else:
            e = e + jnp.einsum("mh,nmhf->nf", h_prev, params.w_msg)
    elif ct == CommType.COMMNET:
        adj = jnp.asarray(spec.adj())
        deg = jnp.maximum(adj.sum(-1, keepdims=True), 1.0)
        mean_h = (adj @ h_prev) / deg
        e = e + mean_h @ params.w_msg
    elif ct == CommType.DIAL:
        m = jnp.einsum("mh,mhk->mk", h_prev, params.w_dial.w) + params.w_dial.b
        if sparse:  # packed [N, K, n_msg, F]
            e = e + jnp.einsum("nkd,nkdf->nf", m[idx], params.w_msg)
        else:
            e = e + jnp.einsum("mk,nmkf->nf", m, params.w_msg)
    return jax.nn.relu(e)


def policy_step_batched(spec: PolicySpec, params: PolicyParams,
                        carry: Carry, obs: jax.Array, fp: jax.Array,
                        done: jax.Array, interpret: bool = False
                        ) -> Tuple[Carry, jax.Array, jax.Array]:
    """One control step for all N agents of B env instances — equivalent
    to ``jax.vmap(policy_step)`` (tested), but the per-agent LSTM cell
    runs as ONE fused Pallas kernel (ops/pallas_lstm.py) instead of a
    tail of small batched matmuls + elementwise gate ops per scan step.

    carry: (c, h) each [B, N, H]; obs [B, N, S]; fp [B, N, A]; done [B].
    interpret=True runs the kernel anywhere (CPU tests).
    """
    from deeprl_network_tpu.ops.pallas_lstm import fused_agent_lstm

    done = done.astype(carry.h.dtype)
    h_prev = carry.h * (1.0 - done)[:, None, None]
    e = jax.vmap(lambda h, o, f: _embed(spec, params, h, o, f))(
        h_prev, obs, fp)
    c2, h2 = fused_agent_lstm(
        (params.lstm.wx, params.lstm.wh, params.lstm.b),
        (carry.c, carry.h), e, done, interpret)
    logits = jnp.einsum("bnh,nha->bna", h2, params.actor.w) + params.actor.b
    logits = logits + jnp.asarray(spec.logit_mask())
    value = (jnp.einsum("bnh,nhv->bnv", h2, params.critic.w)
             + params.critic.b)[..., 0]
    return Carry(c2, h2), logits, value


def consensus_matrix(neighbor_mask: np.ndarray) -> np.ndarray:
    """Row-normalized (A + I): theta_i <- mean over N(i) u {i}."""
    a = neighbor_mask.astype(np.float32) + np.eye(len(neighbor_mask),
                                                 dtype=np.float32)
    return a / a.sum(1, keepdims=True)


def _masked_axis_consensus(closed: jax.Array, leaf: jax.Array,
                           valid: jax.Array, axis: int) -> jax.Array:
    """Consensus-average ``leaf`` [N, ...] over the closed neighborhood,
    restricted along ``axis`` to the slices each agent actually uses.

    valid: [N, K] with K = leaf.shape[axis]; slice k of agent j enters the
    average only where valid[j, k] = 1, and the mean renormalizes by the
    number of CONTRIBUTING neighbors per slice. Slices invalid for agent i
    itself keep their own (untrained) value. With an all-ones mask this
    reduces exactly to the plain row-normalized (A + I) average."""
    lv = jnp.moveaxis(leaf, axis, 1)                       # [N, K, ...]
    hi = jax.lax.Precision.HIGHEST
    num = jnp.einsum("ij,jk,jk...->ik...", closed, valid, lv, precision=hi)
    den = jnp.einsum("ij,jk->ik", closed, valid, precision=hi)
    den = jnp.maximum(den, 1.0).reshape(den.shape + (1,) * (lv.ndim - 2))
    vm = valid.reshape(valid.shape + (1,) * (lv.ndim - 2))
    out = jnp.where(vm > 0, num / den, lv)
    return jnp.moveaxis(out, 1, axis)


def consensus_update(params: PolicyParams, neighbor_mask: np.ndarray,
                     action_mask: Optional[np.ndarray] = None,
                     obs_mask: Optional[np.ndarray] = None) -> PolicyParams:
    """IA2C_CU post-update weight consensus (reference ConsensusPolicy
    ~L300 / models.py IA2C_CU ~L260): per-agent weights are averaged over
    the closed neighborhood.

    With ``action_mask``/``obs_mask`` (heterogeneous graphs, e.g.
    Monaco-28 with n_a 2-6 and per-node obs widths) the average is
    SHAPE-AWARE: actor-head columns are averaged only across neighbors
    for which that action index is valid, and obs-embedding rows only
    across neighbors that use that obs dim — renormalized by the
    contributing count; an agent's padded slices (which never receive
    gradient and sit at their random init) are kept as-is and never
    pollute a neighbor. The reference's TF1 per-agent variables have
    DIFFERENT shapes across heterogeneous nodes, so its consensus can
    only ever average shape-compatible weights — blind averaging of
    padded heads is destruction the reference could not express (VERDICT
    r4 Weak #2; A/B on Monaco-28 in results/README.md round 5). On
    homogeneous specs (all-ones masks) the actor/obs handling reduces
    exactly to the blind average (unit-pinned).

    Leaves without a leading agent axis (e.g. CommNet's shared message
    map) are left untouched. Dense per-edge blocks [N, N, ...] average
    block (i, j) only over neighbors k that also own an edge to j —
    NOTE this differs from the blind form even on homogeneous graphs
    (the blind mean includes zero non-edge blocks, pulling edge blocks
    toward zero). IA2C_CU — the only consensus user — has comm type
    NONE, so these leaves are None today; the branch exists so a
    hypothetical comm+consensus variant averages shared edges rather
    than shrinking them."""
    n = len(neighbor_mask)
    closed_np = neighbor_mask.astype(np.float32) + np.eye(n, dtype=np.float32)
    closed = jnp.asarray(closed_np)
    c = jnp.asarray(closed_np / closed_np.sum(1, keepdims=True))
    adj = jnp.asarray(neighbor_mask.astype(np.float32))
    hi = jax.lax.Precision.HIGHEST

    def plain(leaf):
        if leaf is None:
            return None
        if leaf.ndim == 0 or leaf.shape[0] != n:
            return leaf                      # no agent axis: not averaged
        # weight averaging must be exact (f32) even where matmuls default
        # to bf16 on TPU
        return jnp.einsum("ij,j...->i...", c, leaf, precision=hi)

    def edge_blocks(leaf):
        """[N, N, ...] per-edge blocks: block (i, j) averages over
        k in N(i) u {i} restricted to adj[k, j] = 1 (shared neighbors);
        non-edges keep their (zero) value."""
        if leaf is None:
            return None
        if leaf.ndim >= 2 and leaf.shape[:2] == (n, n):
            return _masked_axis_consensus(closed, leaf, adj, axis=1)
        return plain(leaf)

    if action_mask is None and obs_mask is None:
        return jax.tree.map(plain, params, is_leaf=lambda x: x is None)

    actor, w_obs = params.actor, params.w_obs
    if action_mask is not None:
        am = jnp.asarray(action_mask.astype(np.float32))
        actor = actor._replace(
            w=_masked_axis_consensus(closed, actor.w, am, axis=2),
            b=_masked_axis_consensus(closed, actor.b, am, axis=1))
    else:
        actor = jax.tree.map(plain, actor)
    if obs_mask is not None:
        om = jnp.asarray(obs_mask.astype(np.float32))
        w_obs = w_obs._replace(
            w=_masked_axis_consensus(closed, w_obs.w, om, axis=1),
            b=plain(w_obs.b))
    else:
        w_obs = jax.tree.map(plain, w_obs)
    return params._replace(
        w_obs=w_obs,
        lstm=jax.tree.map(plain, params.lstm),
        actor=actor,
        critic=jax.tree.map(plain, params.critic),
        w_fp=edge_blocks(params.w_fp),
        w_msg=edge_blocks(params.w_msg),
        w_dial=(jax.tree.map(plain, params.w_dial)
                if params.w_dial is not None else None),
        w_nobs=edge_blocks(params.w_nobs))
