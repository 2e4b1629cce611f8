"""Pallas TPU kernel: fused per-agent LSTM cell step with custom VJP.

The multi-agent policies apply N independent LSTM cells (per-agent
weights) to a [B, N, features] activation every control step
(models/policies.py policy_step; reference agents/utils.py ``lstm``). In
plain XLA this lowers to several batched matmuls plus a tail of
elementwise gate ops; this kernel fuses the whole cell — both matmuls,
bias, the four gates, the done-masked state update — into one
``pallas_call`` per step, with a hand-written backward kernel so the
fusion survives autodiff.

Grid: (N, B/BT). Each program handles one agent's weight block and a
BT-row tile of the batch: z = x @ wx[n] + h @ wh[n] + b[n]; gates in the
baselines order (i, f, o, u); c' = sig(f) c + sig(i) tanh(u);
h' = sig(o) tanh(c'). done-masking of the carried state happens before
the matmuls, matching models/layers.lstm_step exactly (golden-tested
against it in tests/test_pallas_ops.py, interpret mode).

Use ``fused_agent_lstm(params, carry, x, done)`` as a drop-in for the
vmapped ``lstm_step`` on TPU; interpret=True runs it anywhere.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bt(B: int) -> int:
    for bt in (256, 128, 64, 32, 16, 8):
        if B % bt == 0:
            return min(bt, B)
    return B


def _fwd_call(params, carry, x, done, interpret):
    wx, wh, b = params
    c, h = carry
    B, N, F = x.shape
    H = h.shape[-1]
    BT = _pick_bt(B)
    grid = (N, B // BT)
    done2 = done.reshape(B, 1)
    # agent-major layout [N, B, X]: each grid program (n, bt) reads one
    # agent's weight block and a BT-row batch tile
    xt = x.transpose(1, 0, 2)
    ht = h.transpose(1, 0, 2)
    ct = c.transpose(1, 0, 2)

    in_specs = [
        pl.BlockSpec((1, BT, F), lambda n, bt: (n, bt, 0)),    # x
        pl.BlockSpec((1, BT, H), lambda n, bt: (n, bt, 0)),    # h
        pl.BlockSpec((1, BT, H), lambda n, bt: (n, bt, 0)),    # c
        pl.BlockSpec((BT, 1), lambda n, bt: (bt, 0)),          # done
        pl.BlockSpec((1, F, 4 * H), lambda n, bt: (n, 0, 0)),  # wx
        pl.BlockSpec((1, H, 4 * H), lambda n, bt: (n, 0, 0)),  # wh
        # bias as [N, 1, 4H]: TPU lowering needs the last two block dims
        # divisible by (8, 128) or equal to the array dims; (1, 4H) on an
        # [N, 4H] array satisfies neither when N > 1
        pl.BlockSpec((1, 1, 4 * H), lambda n, bt: (n, 0, 0)),  # b
    ]
    out_specs = [pl.BlockSpec((1, BT, H), lambda n, bt: (n, bt, 0))
                 for _ in range(6)]
    out_shape = [jax.ShapeDtypeStruct((N, B, H), jnp.float32)
                 for _ in range(6)]

    def kernel(x_r, h_r, c_r, d_r, wx_r, wh_r, b_r, *outs):
        mask = 1.0 - d_r[...]                       # [BT, 1]
        h_in = h_r[0] * mask
        c_in = c_r[0] * mask
        z = (jnp.dot(x_r[0], wx_r[0], preferred_element_type=jnp.float32)
             + jnp.dot(h_in, wh_r[0], preferred_element_type=jnp.float32)
             + b_r[0])
        i = jax.nn.sigmoid(z[:, :H])
        f = jax.nn.sigmoid(z[:, H:2 * H])
        o = jax.nn.sigmoid(z[:, 2 * H:3 * H])
        u = jnp.tanh(z[:, 3 * H:])
        c_new = f * c_in + i * u
        h_new = o * jnp.tanh(c_new)
        h_out, c_out, i_o, f_o, o_o, u_o = outs
        h_out[0] = h_new
        c_out[0] = c_new
        i_o[0] = i
        f_o[0] = f
        o_o[0] = o
        u_o[0] = u

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xt, ht, ct, done2, wx, wh, b[:, None, :])
    h_new, c_new, gi, gf, go, gu = [o.transpose(1, 0, 2) for o in outs]
    return (c_new, h_new), (gi, gf, go, gu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_agent_lstm(params, carry, x, done, interpret=False):
    """params = (wx [N,F,4H], wh [N,H,4H], b [N,4H]); carry = (c, h) each
    [B,N,H]; x [B,N,F]; done [B]. Returns (c', h') — drop-in for
    jax.vmap(lstm_step) over stacked agents, fused into one TPU kernel."""
    (c_new, h_new), _ = _fwd_call(params, carry, x, done, interpret)
    return c_new, h_new


def _fused_fwd(params, carry, x, done, interpret):
    (c_new, h_new), gates = _fwd_call(params, carry, x, done, interpret)
    c, h = carry
    mask = (1.0 - done)[:, None, None]
    res = (params, x, h * mask, c * mask, c_new, gates, mask)
    return (c_new, h_new), res


def _fused_bwd(interpret, res, grads):
    params, x, h_in, c_in, c_new, (gi, gf, go, gu), mask = res
    wx, wh, b = params
    dc_new, dh_new = grads
    tc = jnp.tanh(c_new)
    do = dh_new * tc
    dc = dh_new * go * (1.0 - tc * tc) + dc_new
    df = dc * c_in
    dcin = dc * gf
    di = dc * gu
    du = dc * gi
    # through the activations
    g_i = di * gi * (1.0 - gi)
    g_f = df * gf * (1.0 - gf)
    g_o = do * go * (1.0 - go)
    g_u = du * (1.0 - gu * gu)
    gz = jnp.concatenate([g_i, g_f, g_o, g_u], axis=-1)   # [B, N, 4H]
    dx = jnp.einsum("bnk,nfk->bnf", gz, wx)
    dh_in = jnp.einsum("bnk,nhk->bnh", gz, wh)
    dwx = jnp.einsum("bnf,bnk->nfk", x, gz)
    dwh = jnp.einsum("bnh,bnk->nhk", h_in, gz)
    db = jnp.sum(gz, axis=0)
    dh = dh_in * mask
    dc_prev = dcin * mask
    return (dwx, dwh, db), (dc_prev, dh), dx, None


fused_agent_lstm.defvjp(_fused_fwd, _fused_bwd)
