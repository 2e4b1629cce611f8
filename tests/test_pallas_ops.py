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


def test_policy_step_batched_matches_vmap():
    """policy_step_batched (fused Pallas LSTM, interpret mode) must equal
    jax.vmap(policy_step) — outputs and parameter/carry gradients."""
    import numpy as np
    from deeprl_network_tpu.models.policies import (
        Carry, CommType, PolicySpec, init_policy_params, mask_comm_params,
        policy_step, policy_step_batched,
    )

    n, B = 4, 6
    adj = np.zeros((n, n), np.float32)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = 1
    spec = PolicySpec(n_agent=n, n_s_max=5, n_a_max=3, n_fc=8, n_lstm=8,
                      comm_type=CommType.NEURCOMM, n_msg=8,
                      neighbor_mask=adj,
                      action_mask=np.ones((n, 3), np.float32))
    params = init_policy_params(jax.random.key(0), spec)
    carry = Carry(jax.random.normal(jax.random.key(1), (B, n, 8)) * 0.3,
                  jax.random.normal(jax.random.key(2), (B, n, 8)) * 0.3)
    obs = jax.random.normal(jax.random.key(3), (B, n, 5))
    fp = jax.nn.softmax(jax.random.normal(jax.random.key(4), (B, n, 3)))
    done = jnp.array([0., 1., 0., 0., 1., 0.])

    def run(fn):
        def f(p):
            mp = mask_comm_params(spec, p)
            nc, logits, v = fn(mp)
            return jnp.sum(logits ** 2) + jnp.sum(v ** 2), (nc, logits, v)
        return jax.value_and_grad(f, has_aux=True)(params)

    vstep = jax.vmap(policy_step, in_axes=(None, None, 0, 0, 0, 0))
    (l_r, (nc_r, lo_r, v_r)), g_r = run(
        lambda p: vstep(spec, p, carry, obs, fp, done))
    (l_p, (nc_p, lo_p, v_p)), g_p = run(
        lambda p: policy_step_batched(spec, p, carry, obs, fp, done,
                                      interpret=True))
    np.testing.assert_allclose(np.array(lo_p), np.array(lo_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.array(v_p), np.array(v_r),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(nc_p), jax.tree.leaves(nc_r)):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=1e-4, atol=1e-5)


def test_bf16_forward_matches_f32_reference():
    """bf16 kernel (f32 gate math in-kernel) tracks the f32 reference
    cell to bf16 tolerance."""
    p, x, c, h, done = setup()
    c_ref, h_ref = ref_step(p, c, h, x, done)
    bf = lambda t: t.astype(jnp.bfloat16)
    c_pal, h_pal = fused_agent_lstm((bf(p.wx), bf(p.wh), bf(p.b)),
                                    (bf(c), bf(h)), bf(x), done, True)
    assert c_pal.dtype == jnp.bfloat16 and h_pal.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.array(c_pal, np.float32),
                               np.array(c_ref), atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.array(h_pal, np.float32),
                               np.array(h_ref), atol=0.05, rtol=0.05)


def test_bf16_gradients_match_f32_reference():
    """bf16 kernel grads (f32 accumulation, bf16 cotangents) track the
    f32 reference grads to bf16 tolerance, with matching dtypes."""
    p, x, c, h, done = setup()

    def loss_ref(wx, wh, b, c, h, x):
        pp = LSTMParams(wx, wh, b)
        c2, h2 = ref_step(pp, c, h, x, done)
        return jnp.sum(h2 ** 2) + jnp.sum(jnp.sin(c2))

    def loss_pal(wx, wh, b, c, h, x):
        bf = lambda t: t.astype(jnp.bfloat16)
        c2, h2 = fused_agent_lstm((bf(wx), bf(wh), bf(b)),
                                  (bf(c), bf(h)), bf(x), done, True)
        return (jnp.sum(h2.astype(jnp.float32) ** 2)
                + jnp.sum(jnp.sin(c2.astype(jnp.float32))))

    args = (p.wx, p.wh, p.b, c, h, x)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_pal = jax.grad(loss_pal, argnums=tuple(range(6)))(*args)
    for a, b_, name in zip(g_ref, g_pal,
                           ["wx", "wh", "b", "c", "h", "x"]):
        # per-element tolerance (ADVICE round 3): the old
        # atol = 0.05 * |ref|.max() bound left small-magnitude entries
        # effectively unchecked whenever one entry was large
        np.testing.assert_allclose(
            np.array(b_, np.float32), np.array(a),
            rtol=0.05, atol=0.05, err_msg=name)


def test_train_step_use_pallas_bf16_smoke():
    """Full fused train step: bf16 compute + Pallas LSTM together."""
    import numpy as np
    from deeprl_network_tpu.config import EnvConfig, ModelConfig, TrainConfig
    from deeprl_network_tpu.envs.cacc import CACCEnv
    from deeprl_network_tpu.utils.rollout import make_a2c

    ecfg = EnvConfig(scenario="cacc_catchup", coop_gamma=0.9,
                     episode_length=40)
    mcfg = ModelConfig(batch_size=8, num_fc=16, num_lstm=16, num_envs=4,
                       use_pallas=True, compute_dtype="bfloat16")
    tcfg = TrainConfig(total_step=10_000)
    env = CACCEnv(ecfg)
    fns = make_a2c(env, mcfg, tcfg, agent="ma2c_nc")
    ts = fns.init_state(jax.random.key(0))
    ts, m = fns.train_step(ts)
    assert np.isfinite(float(m["loss"]))
    # master params stay f32
    assert ts.params.lstm.wx.dtype == jnp.float32


def test_train_step_use_pallas_smoke():
    """Full fused train step with the Pallas LSTM cell (interpret on CPU)."""
    import dataclasses
    import numpy as np
    from deeprl_network_tpu.config import EnvConfig, ModelConfig, TrainConfig
    from deeprl_network_tpu.envs.cacc import CACCEnv
    from deeprl_network_tpu.utils.rollout import make_a2c

    ecfg = EnvConfig(scenario="cacc_catchup", coop_gamma=0.9,
                     episode_length=40)
    mcfg = ModelConfig(batch_size=8, num_fc=16, num_lstm=16, num_envs=4,
                       use_pallas=True)
    tcfg = TrainConfig(total_step=10_000)
    env = CACCEnv(ecfg)
    fns = make_a2c(env, mcfg, tcfg, agent="ma2c_nc")
    ts = fns.init_state(jax.random.key(0))
    ts, m = fns.train_step(ts)
    assert np.isfinite(float(m["loss"]))
