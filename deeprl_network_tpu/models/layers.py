"""NN/RL primitives with TF1-parity semantics.

TPU-native counterpart of the reference ``agents/utils.py`` (fc, lstm,
batch_to_seq/seq_to_batch, one_hot; SURVEY.md section 2.2 item 5). The
reference implements an openai/baselines-style manual LSTM cell in TF1; we
reproduce its exact math as a pure function suitable for ``lax.scan``:

- orthogonal weight init with a scale factor (reference ``fc`` ~L10);
- LSTM with gates split in (i, f, o, u) order, no forget bias, and
  done-masking applied to the carried (c, h) BEFORE the gate computation
  (reference ``lstm`` ~L30: state multiplied by (1 - done));
- TF1 ``tf.train.RMSPropOptimizer`` semantics: eps INSIDE the sqrt
  (``g / sqrt(ms + eps)``), centered=False, momentum=0 — realized with
  optax ``scale_by_rms(eps_in_sqrt=True)`` (SURVEY.md section 7 "hard
  parts": RMSProp epsilon placement).

There is no batch_to_seq/seq_to_batch here: ``lax.scan`` over the time axis
replaces the reference's python-unrolled BPTT entirely.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def ortho_init(key: jax.Array, shape: Tuple[int, ...], scale: float = 1.0,
               dtype=jnp.float32) -> jax.Array:
    """Orthogonal initializer matching baselines/TF1 ``ortho_init``.

    For >2D shapes the leading axes are treated as batch: each [in, out]
    block is independently orthogonal (used for the per-agent / per-edge
    stacked weights).
    """
    if len(shape) < 2:
        raise ValueError("ortho_init needs >=2D shape")
    *batch, n_in, n_out = shape
    n_blocks = int(np.prod(batch)) if batch else 1
    keys = jax.random.split(key, n_blocks)

    def one(k):
        a = jax.random.normal(k, (n_in, n_out), jnp.float32)
        u, _, vt = jnp.linalg.svd(a, full_matrices=False)
        q = u if u.shape == (n_in, n_out) else vt
        return (scale * q).astype(dtype)

    w = jax.vmap(one)(keys)
    return w.reshape(*batch, n_in, n_out) if batch else w[0]


class FCParams(NamedTuple):
    w: jax.Array  # [..., n_in, n_out]
    b: jax.Array  # [..., n_out]


def fc_init(key: jax.Array, n_in: int, n_out: int, scale: float = 1.0,
            batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> FCParams:
    """fc layer params (reference agents/utils.py ``fc`` ~L10): ortho W, zero b."""
    w = ortho_init(key, (*batch_shape, n_in, n_out), scale, dtype)
    b = jnp.zeros((*batch_shape, n_out), dtype)
    return FCParams(w, b)


def fc_apply(p: FCParams, x: jax.Array) -> jax.Array:
    return x @ p.w + p.b


class LSTMParams(NamedTuple):
    wx: jax.Array  # [..., n_in, 4*n_h]
    wh: jax.Array  # [..., n_h, 4*n_h]
    b: jax.Array   # [..., 4*n_h]


def lstm_init(key: jax.Array, n_in: int, n_h: int, scale: float = 1.0,
              batch_shape: Tuple[int, ...] = (), dtype=jnp.float32
              ) -> LSTMParams:
    kx, kh = jax.random.split(key)
    wx = ortho_init(kx, (*batch_shape, n_in, 4 * n_h), scale, dtype)
    wh = ortho_init(kh, (*batch_shape, n_h, 4 * n_h), scale, dtype)
    b = jnp.zeros((*batch_shape, 4 * n_h), dtype)
    return LSTMParams(wx, wh, b)


def lstm_step(p: LSTMParams, carry: Tuple[jax.Array, jax.Array],
              x: jax.Array, done: jax.Array
              ) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
    """One LSTM step, reference agents/utils.py ``lstm`` (~L30) semantics.

    carry = (c, h), each [..., n_h]; ``done`` broadcastable to carry and
    applied BEFORE the gates: c,h <- c,h * (1 - done). Gate split order is
    (i, f, o, u) as in baselines; no forget-gate bias.
    """
    c, h = carry
    mask = (1.0 - done)[..., None].astype(c.dtype)
    c = c * mask
    h = h * mask
    z = x @ p.wx + h @ p.wh + p.b
    i, f, o, u = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    u = jnp.tanh(u)
    c_new = f * c + i * u
    h_new = o * jnp.tanh(c_new)
    return (c_new, h_new), h_new


def one_hot(x: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """reference agents/utils.py ``one_hot`` ~L90."""
    return jax.nn.one_hot(x, n, dtype=dtype)


def tf1_rmsprop(lr_schedule, decay: float = 0.99, eps: float = 1e-5,
                max_grad_norm: float = 40.0) -> optax.GradientTransformation:
    """TF1 RMSProp + global-norm clip, reference agents/policies.py
    ``prepare_loss`` (~L10): RMSProp(rmsp_alpha=0.99, rmsp_epsilon=1e-5),
    clip_by_global_norm(max_grad_norm=40).

    TF1 update: ms <- decay*ms + (1-decay)*g^2; p <- p - lr * g/sqrt(ms+eps).
    optax scale_by_rms(eps_in_sqrt=True) reproduces the eps-inside-sqrt
    placement exactly.
    """
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_rms(decay=decay, eps=eps, eps_in_sqrt=True,
                           initial_scale=0.0),
        optax.scale_by_learning_rate(lr_schedule),
    )
