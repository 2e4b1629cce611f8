"""Unit tests for TF1-parity NN primitives (SURVEY.md section 7 "hard
parts": each TF1 op semantics encoded as a closed-form unit test)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deeprl_network_tpu.models.layers import (
    LSTMParams, fc_init, lstm_init, lstm_step, ortho_init, tf1_rmsprop,
)


def test_ortho_init_is_orthogonal():
    w = np.array(ortho_init(jax.random.key(0), (64, 64), scale=1.0))
    np.testing.assert_allclose(w.T @ w, np.eye(64), atol=1e-5)


def test_ortho_init_scale():
    w = np.array(ortho_init(jax.random.key(0), (32, 32), scale=np.sqrt(2)))
    np.testing.assert_allclose(w.T @ w, 2.0 * np.eye(32), atol=1e-5)


def test_ortho_init_batched_blocks():
    w = np.array(ortho_init(jax.random.key(1), (3, 16, 16), 1.0))
    for i in range(3):
        np.testing.assert_allclose(w[i].T @ w[i], np.eye(16), atol=1e-5)
    assert not np.allclose(w[0], w[1])


def _np_lstm_step(wx, wh, b, c, h, x, done):
    """Closed-form reference: baselines-style LSTM, gates (i, f, o, u),
    done-mask applied to carried state BEFORE gates."""
    c = c * (1 - done)
    h = h * (1 - done)
    z = x @ wx + h @ wh + b
    i, f, o, u = np.split(z, 4, axis=-1)
    sig = lambda v: 1 / (1 + np.exp(-v))
    i, f, o, u = sig(i), sig(f), sig(o), np.tanh(u)
    c2 = f * c + i * u
    h2 = o * np.tanh(c2)
    return c2, h2


def test_lstm_step_matches_closed_form():
    rng = np.random.RandomState(0)
    n_in, n_h = 5, 4
    wx = rng.randn(n_in, 4 * n_h).astype(np.float32)
    wh = rng.randn(n_h, 4 * n_h).astype(np.float32)
    b = rng.randn(4 * n_h).astype(np.float32)
    c = rng.randn(n_h).astype(np.float32)
    h = rng.randn(n_h).astype(np.float32)
    x = rng.randn(n_in).astype(np.float32)
    p = LSTMParams(jnp.asarray(wx), jnp.asarray(wh), jnp.asarray(b))
    (c2, h2), out = lstm_step(p, (jnp.asarray(c), jnp.asarray(h)),
                              jnp.asarray(x), jnp.zeros(()))
    ec, eh = _np_lstm_step(wx, wh, b, c, h, x, 0.0)
    np.testing.assert_allclose(np.array(c2), ec, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.array(h2), eh, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.array(out), eh, rtol=1e-4, atol=1e-5)


def test_lstm_done_resets_state():
    p = lstm_init(jax.random.key(0), 3, 4)
    c = jnp.ones((4,))
    h = jnp.ones((4,))
    x = jnp.ones((3,))
    (c_done, h_done), _ = lstm_step(p, (c, h), x, jnp.ones(()))
    (c_zero, h_zero), _ = lstm_step(p, (jnp.zeros(4), jnp.zeros(4)), x,
                                    jnp.zeros(()))
    np.testing.assert_allclose(np.array(c_done), np.array(c_zero), atol=1e-6)
    np.testing.assert_allclose(np.array(h_done), np.array(h_zero), atol=1e-6)


def test_tf1_rmsprop_closed_form():
    """TF1: ms <- a*ms + (1-a) g^2;  p <- p - lr * g / sqrt(ms + eps)."""
    lr, alpha, eps = 1e-3, 0.99, 1e-5
    opt = tf1_rmsprop(lambda c: lr, decay=alpha, eps=eps,
                      max_grad_norm=1e9)
    p = {"w": jnp.asarray([1.0, -2.0])}
    g = {"w": jnp.asarray([0.5, 0.25])}
    state = opt.init(p)
    updates, _ = opt.update(g, state, p)
    gn = np.array(g["w"])
    ms = (1 - alpha) * gn ** 2
    expected = -lr * gn / np.sqrt(ms + eps)
    np.testing.assert_allclose(np.array(updates["w"]), expected, rtol=1e-5)


def test_tf1_rmsprop_clips_global_norm():
    opt = tf1_rmsprop(lambda c: 1.0, max_grad_norm=1.0)
    p = {"w": jnp.zeros(3)}
    g = {"w": jnp.asarray([10.0, 0.0, 0.0])}
    st = opt.init(p)
    # after clipping the gradient has norm 1
    clipped, _ = optax.clip_by_global_norm(1.0).update(g, None, p)
    assert np.isclose(np.array(optax.global_norm(clipped)), 1.0, rtol=1e-5)
