"""Pallas fused LSTM kernel vs the reference-parity lstm_step, forward and
gradients (interpret mode; the kernel runs compiled on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_network_tpu.models.layers import LSTMParams, lstm_init, lstm_step
from deeprl_network_tpu.ops.pallas_lstm import fused_agent_lstm


def setup(B=8, N=3, F=16, H=16, seed=0):
    k = jax.random.split(jax.random.key(seed), 6)
    p = lstm_init(k[0], F, H, batch_shape=(N,))
    x = jax.random.normal(k[1], (B, N, F))
    c = jax.random.normal(k[2], (B, N, H))
    h = jax.random.normal(k[3], (B, N, H))
    done = (jax.random.uniform(k[4], (B,)) < 0.3).astype(jnp.float32)
    return p, x, c, h, done


def ref_step(p, c, h, x, done):
    """vmapped reference cell over (batch, agent)."""
    def per_env(c, h, x, d):
        (c2, h2), _ = jax.vmap(lstm_step, in_axes=(0, 0, 0, None))(
            p, (c, h), x, d)
        return c2, h2
    return jax.vmap(per_env)(c, h, x, done)


def test_forward_matches_reference():
    p, x, c, h, done = setup()
    c_ref, h_ref = ref_step(p, c, h, x, done)
    c_pal, h_pal = fused_agent_lstm((p.wx, p.wh, p.b), (c, h), x, done,
                                    True)
    np.testing.assert_allclose(np.array(c_pal), np.array(c_ref), atol=1e-5)
    np.testing.assert_allclose(np.array(h_pal), np.array(h_ref), atol=1e-5)


def test_gradients_match_reference():
    p, x, c, h, done = setup()

    def loss_ref(wx, wh, b, c, h, x):
        pp = LSTMParams(wx, wh, b)
        c2, h2 = ref_step(pp, c, h, x, done)
        return jnp.sum(h2 ** 2) + jnp.sum(jnp.sin(c2))

    def loss_pal(wx, wh, b, c, h, x):
        c2, h2 = fused_agent_lstm((wx, wh, b), (c, h), x, done, True)
        return jnp.sum(h2 ** 2) + jnp.sum(jnp.sin(c2))

    args = (p.wx, p.wh, p.b, c, h, x)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_pal = jax.grad(loss_pal, argnums=tuple(range(6)))(*args)
    for a, b_, name in zip(g_ref, g_pal,
                           ["wx", "wh", "b", "c", "h", "x"]):
        np.testing.assert_allclose(np.array(b_), np.array(a), atol=1e-4,
                                   rtol=1e-4, err_msg=name)


def test_done_masks_carry_gradient():
    p, x, c, h, done = setup()
    all_done = jnp.ones_like(done)

    def loss(c):
        c2, h2 = fused_agent_lstm((p.wx, p.wh, p.b), (c, h), x, all_done,
                                  True)
        return jnp.sum(h2)

    g = np.array(jax.grad(loss)(c))
    np.testing.assert_allclose(g, 0.0, atol=1e-7)


def test_odd_batch_sizes():
    p, x, c, h, done = setup(B=12)
    c_ref, h_ref = ref_step(p, c, h, x, done)
    c_pal, h_pal = fused_agent_lstm((p.wx, p.wh, p.b), (c, h), x, done,
                                    True)
    np.testing.assert_allclose(np.array(h_pal), np.array(h_ref), atol=1e-5)
