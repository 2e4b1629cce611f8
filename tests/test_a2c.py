"""Returns/advantage and comm-policy unit tests (SURVEY.md Appendix C
tests 2 and 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_network_tpu.envs.base import EnvSpec, hop_distances
from deeprl_network_tpu.models.a2c import (
    nstep_returns, normalize_rewards, spatial_mix,
)
from deeprl_network_tpu.models.policies import (
    Carry, CommType, PolicySpec, consensus_matrix, consensus_update,
    init_carry, init_fingerprint, init_policy_params, mask_comm_params,
    policy_step,
)


def test_nstep_returns_hand_computed():
    """3-step episode with a mid-batch done (Appendix C test 2)."""
    gamma = 0.9
    r = jnp.asarray([[1.0], [2.0], [3.0]])          # [T=3, N=1]
    dones = jnp.asarray([0.0, 1.0, 0.0])
    boot = jnp.asarray([10.0])
    R = np.array(nstep_returns(r, dones, boot, gamma))
    # R_2 = 3 + .9*10 = 12; R_1 = 2 (done cuts); R_0 = 1 + .9*2 = 2.8
    np.testing.assert_allclose(R[:, 0], [2.8, 2.0, 12.0], rtol=1e-6)


def test_returns_done_at_end_ignores_bootstrap():
    R = np.array(nstep_returns(jnp.asarray([[1.0]]), jnp.asarray([1.0]),
                               jnp.asarray([99.0]), 0.99))
    np.testing.assert_allclose(R, [[1.0]])


def test_normalize_and_clip():
    r = jnp.asarray([4000.0, -10000.0])
    out = np.array(normalize_rewards(r, 2000.0, 2.0))
    np.testing.assert_allclose(out, [2.0, -2.0])


def test_spatial_mix_line_graph():
    """3-agent line graph, alpha=0.5 (Appendix A spatial discounting)."""
    adj = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], np.float32)
    spec = EnvSpec(3, (1, 1, 1), (2, 2, 2), adj, hop_distances(adj), 0.5)
    D = spec.spatial_discount()
    np.testing.assert_allclose(
        D, [[1, .5, .25], [.5, 1, .5], [.25, .5, 1]])
    r = jnp.asarray([1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.array(spatial_mix(r, jnp.asarray(D))),
                               [1.0, 0.5, 0.25])


def test_spatial_mix_global_when_negative():
    adj = np.array([[0, 1], [1, 0]], np.float32)
    spec = EnvSpec(2, (1, 1), (2, 2), adj, hop_distances(adj), -1.0)
    D = spec.spatial_discount()
    np.testing.assert_allclose(D, np.ones((2, 2)))


def _mk_spec(comm, n=3):
    adj = np.zeros((n, n), np.float32)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = 1
    return PolicySpec(n_agent=n, n_s_max=4, n_a_max=3, n_fc=8, n_lstm=8,
                      comm_type=comm, n_msg=8, neighbor_mask=adj,
                      action_mask=np.ones((n, 3), np.float32))


@pytest.mark.parametrize("comm", list(CommType))
def test_policy_step_shapes(comm):
    spec = _mk_spec(comm)
    params = init_policy_params(jax.random.key(0), spec)
    carry = init_carry(spec)
    obs = jnp.ones((3, 4))
    fp = init_fingerprint(spec)
    carry2, logits, value = policy_step(spec, params, carry, obs, fp,
                                        jnp.zeros(()))
    assert logits.shape == (3, 3)
    assert value.shape == (3,)
    assert np.isfinite(np.array(logits)).all()


def test_neurcomm_message_routing():
    """Line graph 0-1-2: agent 0's embedding must react to agent 1's
    hidden state but NOT to agent 2's (Appendix C test 3)."""
    spec = _mk_spec(CommType.NEURCOMM)
    params = init_policy_params(jax.random.key(0), spec)
    obs = jnp.zeros((3, 4))
    fp = init_fingerprint(spec)
    base = init_carry(spec)

    def logits0(h_perturb):
        carry = Carry(base.c, base.h + h_perturb)
        _, logits, _ = policy_step(spec, params, carry, obs, fp,
                                   jnp.zeros(()))
        return logits

    l_base = logits0(jnp.zeros((3, 8)))
    bump1 = jnp.zeros((3, 8)).at[1].set(1.0)
    bump2 = jnp.zeros((3, 8)).at[2].set(1.0)
    l1 = logits0(bump1)
    l2 = logits0(bump2)
    assert not np.allclose(np.array(l1[0]), np.array(l_base[0]))
    np.testing.assert_allclose(np.array(l2[0]), np.array(l_base[0]),
                               atol=1e-6)
    # 1 is a neighbor of both 0 and 2
    assert not np.allclose(np.array(l1[2]), np.array(l_base[2]))


def test_neurcomm_gradient_flows_through_neighbors():
    """Differentiable comm: d(logit_0)/d(h_1) nonzero for NEURCOMM, zero
    for NONE (reference NCMultiAgentPolicy: gradients flow through
    neighbor messages)."""
    for comm, expect_flow in ((CommType.NEURCOMM, True),
                              (CommType.NONE, False)):
        spec = _mk_spec(comm)
        params = init_policy_params(jax.random.key(0), spec)
        obs = jnp.ones((3, 4))
        fp = init_fingerprint(spec)

        def f(h):
            carry = Carry(jnp.zeros((3, 8)), h)
            _, logits, _ = policy_step(spec, params, carry, obs, fp,
                                       jnp.zeros(()))
            return logits[0].sum()

        g = np.array(jax.grad(f)(jnp.ones((3, 8)) * 0.1))
        if expect_flow:
            assert np.abs(g[1]).sum() > 1e-6
        else:
            np.testing.assert_allclose(g[1], 0.0, atol=1e-8)
        # agent 2 is never a neighbor of agent 0 on the line graph: the
        # only grad path to h_2 would be a direct message 2->0
        np.testing.assert_allclose(g[2], 0.0, atol=1e-8)


def test_fp_no_gradient_through_fingerprints():
    spec = _mk_spec(CommType.FP)
    params = init_policy_params(jax.random.key(0), spec)
    obs = jnp.ones((3, 4))

    def f(fp):
        carry = init_carry(spec)
        _, logits, _ = policy_step(spec, params, carry, obs, fp,
                                   jnp.zeros(()))
        return logits.sum()

    g = np.array(jax.grad(f)(init_fingerprint(spec)))
    np.testing.assert_allclose(g, 0.0, atol=1e-8)


def test_commnet_uses_mean_neighbor_state():
    spec = _mk_spec(CommType.COMMNET)
    params = init_policy_params(jax.random.key(0), spec)
    # shared map: w_msg is [n_lstm, n_fc]
    assert params.w_msg.shape == (8, 8)


def test_consensus_matrix_and_update():
    adj = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], np.float32)
    C = consensus_matrix(adj)
    np.testing.assert_allclose(C.sum(1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(C[0], [0.5, 0.5, 0.0])
    spec = _mk_spec(CommType.NONE)
    params = init_policy_params(jax.random.key(0), spec)
    new = consensus_update(params, adj)
    expected = np.einsum("ij,jkl->ikl", C, np.array(params.w_obs.w))
    np.testing.assert_allclose(np.array(new.w_obs.w), expected, rtol=1e-5)


def test_consensus_masked_equals_plain_on_homogeneous():
    """All-ones masks: the shape-aware consensus must reduce exactly to
    the blind row-normalized (A + I) average."""
    adj = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], np.float32)
    spec = _mk_spec(CommType.NONE)
    params = init_policy_params(jax.random.key(0), spec)
    amask = np.ones((3, spec.n_a_max), np.float32)
    omask = np.ones((3, spec.n_s_max), np.float32)
    plain = consensus_update(params, adj)
    masked = consensus_update(params, adj, amask, omask)
    jax.tree.map(
        lambda a, b: (np.testing.assert_allclose(
            np.array(a), np.array(b), rtol=1e-6, atol=1e-7)
            if a is not None else None),
        plain, masked, is_leaf=lambda x: x is None)


def test_consensus_masked_heterogeneous_heads():
    """Shape-aware rule on a 3-node line graph with n_a = (2, 6, 2):
    - a 2-action node's valid head columns average only with slices that
      are valid on the contributing neighbor (col 0-1: both valid);
    - its PADDED columns (2-5) are untouched (own random init);
    - the 6-action node's columns 2-5 have no valid neighbor, so the
      renormalized average (den = 1, self only) leaves them unchanged.
    Pins VERDICT r4 Weak #2: a 2-action head is never polluted by a
    6-action neighbor's padding and vice versa."""
    adj = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], np.float32)
    n_a_ls = (2, 6, 2)
    amask = np.zeros((3, 6), np.float32)
    for i, na in enumerate(n_a_ls):
        amask[i, :na] = 1.0
    spec = PolicySpec(n_agent=3, n_s_max=4, n_a_max=6, n_fc=8, n_lstm=8,
                      comm_type=CommType.NONE, neighbor_mask=adj,
                      action_mask=amask)
    params = init_policy_params(jax.random.key(3), spec)
    w = np.array(params.actor.w)                  # [3, H, 6]
    new = consensus_update(params, adj, amask)
    nw = np.array(new.actor.w)
    # agent 0 col 0: avg of agents {0, 1} (both valid there)
    np.testing.assert_allclose(nw[0, :, 0], (w[0, :, 0] + w[1, :, 0]) / 2,
                               rtol=1e-5)
    # agent 0 padded cols 2-5: kept verbatim
    np.testing.assert_allclose(nw[0, :, 2:], w[0, :, 2:], rtol=1e-7)
    # agent 1 cols 2-5: valid only on itself -> unchanged by renorm
    np.testing.assert_allclose(nw[1, :, 2:], w[1, :, 2:], rtol=1e-5)
    # agent 1 col 0: all three agents valid -> full closed-neighborhood avg
    np.testing.assert_allclose(nw[1, :, 0], w[:, :, 0].mean(0), rtol=1e-5)
    # bias follows the same rule
    b = np.array(params.actor.b)
    nb = np.array(new.actor.b)
    np.testing.assert_allclose(nb[0, 2:], b[0, 2:], rtol=1e-7)
    np.testing.assert_allclose(nb[1, 2:], b[1, 2:], rtol=1e-5)
    # LSTM (homogeneous) still plainly averaged
    C = consensus_matrix(adj)
    np.testing.assert_allclose(
        np.array(new.lstm.wx),
        np.einsum("ij,j...->i...", C, np.array(params.lstm.wx)), rtol=1e-5)


def test_consensus_masked_obs_rows():
    """Heterogeneous obs widths n_s = (4, 2): agent 1's unused obs rows
    keep their own value; shared rows average."""
    adj = np.array([[0, 1], [1, 0]], np.float32)
    omask = np.array([[1, 1, 1, 1], [1, 1, 0, 0]], np.float32)
    spec = PolicySpec(n_agent=2, n_s_max=4, n_a_max=3, n_fc=8, n_lstm=8,
                      comm_type=CommType.NONE, neighbor_mask=adj)
    params = init_policy_params(jax.random.key(4), spec)
    w = np.array(params.w_obs.w)                  # [2, 4, F]
    new = consensus_update(params, adj, None, omask)
    nw = np.array(new.w_obs.w)
    np.testing.assert_allclose(nw[1, 2:], w[1, 2:], rtol=1e-7)   # own pad
    np.testing.assert_allclose(nw[0, 2:], w[0, 2:], rtol=1e-5)   # self-only
    np.testing.assert_allclose(nw[0, 0], (w[0, 0] + w[1, 0]) / 2, rtol=1e-5)


def test_action_mask_blocks_padded_actions():
    n = 2
    adj = np.array([[0, 1], [1, 0]], np.float32)
    amask = np.array([[1, 1, 1], [1, 1, 0]], np.float32)  # agent 1: n_a=2
    spec = PolicySpec(n_agent=n, n_s_max=4, n_a_max=3, n_fc=8, n_lstm=8,
                      comm_type=CommType.NONE, neighbor_mask=adj,
                      action_mask=amask)
    params = init_policy_params(jax.random.key(0), spec)
    _, logits, _ = policy_step(spec, params, init_carry(spec),
                               jnp.ones((2, 4)), init_fingerprint(spec),
                               jnp.zeros(()))
    probs = np.array(jax.nn.softmax(logits, -1))
    assert probs[1, 2] < 1e-6
    fp = np.array(init_fingerprint(spec))
    np.testing.assert_allclose(fp[1], [0.5, 0.5, 0.0])


@pytest.mark.parametrize("comm", [CommType.FP, CommType.NEURCOMM,
                                  CommType.DIAL])
def test_sparse_comm_matches_dense(comm):
    """K-sparse packed-neighbor message passing must equal the dense
    masked [N, N] einsum form — outputs AND gradients (the gather's
    transpose scatter-adds into the same dense blocks)."""
    import dataclasses

    dense = _mk_spec(comm, n=4)
    sparse = dataclasses.replace(dense, sparse_comm=True)
    params = init_policy_params(jax.random.key(0), dense)
    carry = Carry(jnp.ones((4, 8)) * 0.1, jnp.ones((4, 8)) * 0.2)
    obs = jax.random.normal(jax.random.key(1), (4, 4))
    fp = jax.nn.softmax(jax.random.normal(jax.random.key(2), (4, 3)))
    done = jnp.zeros(())

    def run(spec):
        def f(p):
            mp = mask_comm_params(spec, p)
            nc, logits, v = policy_step(spec, mp, carry, obs, fp, done)
            return jnp.sum(logits ** 2) + jnp.sum(v ** 2), (nc, logits, v)
        (loss, (nc, logits, v)), grads = jax.value_and_grad(
            f, has_aux=True)(params)
        return loss, nc, logits, v, grads

    l_d, nc_d, lo_d, v_d, g_d = run(dense)
    l_s, nc_s, lo_s, v_s, g_s = run(sparse)
    np.testing.assert_allclose(np.array(lo_s), np.array(lo_d),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.array(v_s), np.array(v_d),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree.leaves(nc_s), jax.tree.leaves(nc_d)):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_d)):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=1e-5, atol=1e-6)


def test_neighbor_obs_routing_and_scaling():
    """alpha-scaled neighbor observations (reference _get_state ~L340,
    SURVEY 2.2 item 6): on the line graph 0-1-2, agent 0's embedding must
    react to agent 1's obs through w_nobs but not to agent 2's; the term
    scales linearly with obs_alpha; and it is a data path (no gradient
    into the obs, like fingerprints)."""
    import dataclasses

    base_spec = _mk_spec(CommType.NONE)
    spec = dataclasses.replace(base_spec, neighbor_obs=True, obs_alpha=0.75)
    params = init_policy_params(jax.random.key(0), spec)
    assert params.w_nobs.shape == (3, 3, 4, 8)
    # non-edge blocks zeroed at init: (0,0) self, (0,2) non-edge
    np.testing.assert_allclose(np.array(params.w_nobs[0, 0]), 0.0)
    np.testing.assert_allclose(np.array(params.w_nobs[0, 2]), 0.0)

    fp = init_fingerprint(spec)
    carry = init_carry(spec)

    def logits_for(obs, s=spec, p=params):
        mp = mask_comm_params(s, p)
        _, logits, _ = policy_step(s, mp, carry, obs, fp, jnp.zeros(()))
        return np.array(logits)

    obs0 = jnp.zeros((3, 4))
    bump1 = obs0.at[1].set(1.0)
    bump2 = obs0.at[2].set(1.0)
    l_base, l1, l2 = logits_for(obs0), logits_for(bump1), logits_for(bump2)
    assert not np.allclose(l1[0], l_base[0])       # neighbor obs reaches 0
    np.testing.assert_allclose(l2[0], l_base[0], atol=1e-6)  # non-neighbor
    # without the flag, agent 0 ignores agent 1's obs entirely
    p_off = init_policy_params(jax.random.key(0), base_spec)
    lo_b = logits_for(obs0, base_spec, p_off)
    lo_1 = logits_for(bump1, base_spec, p_off)
    np.testing.assert_allclose(lo_1[0], lo_b[0], atol=1e-6)

    # alpha scaling: the pre-relu neighbor term is linear in obs_alpha
    from deeprl_network_tpu.models.policies import _embed
    h0 = jnp.zeros((3, 8))
    spec2 = dataclasses.replace(spec, obs_alpha=1.5)
    mp = mask_comm_params(spec, params)
    e_a = _embed(spec, mp, h0, bump1, fp)
    e_b = _embed(spec2, mp, h0, bump1, fp)
    e_0 = _embed(spec, mp, h0, obs0, fp)
    # relu is active or not per unit; compare where both positive
    da, db = np.array(e_a - e_0), np.array(e_b - e_0)
    act = (np.array(e_a) > 1e-6) & (np.array(e_b) > 1e-6) & (np.array(e_0) > 1e-6)
    if act.any():
        np.testing.assert_allclose(db[act] / da[act], 2.0, rtol=1e-4)

    # data path: no gradient into obs through the neighbor term
    def f(obs):
        mp = mask_comm_params(spec, params)
        _, logits, _ = policy_step(spec, mp, carry, obs, fp, jnp.zeros(()))
        return logits[0].sum()

    g = np.array(jax.grad(f)(bump1))
    np.testing.assert_allclose(g[1], 0.0, atol=1e-8)


def test_neighbor_obs_sparse_matches_dense():
    import dataclasses

    dense = dataclasses.replace(_mk_spec(CommType.NEURCOMM, n=4),
                                neighbor_obs=True, obs_alpha=0.9)
    sparse = dataclasses.replace(dense, sparse_comm=True)
    params = init_policy_params(jax.random.key(3), dense)
    carry = Carry(jnp.ones((4, 8)) * 0.1, jnp.ones((4, 8)) * 0.2)
    obs = jax.random.normal(jax.random.key(1), (4, 4))
    fp = jax.nn.softmax(jax.random.normal(jax.random.key(2), (4, 3)))

    def run(spec):
        mp = mask_comm_params(spec, params)
        _, logits, v = policy_step(spec, mp, carry, obs, fp, jnp.zeros(()))
        return np.array(logits), np.array(v)

    lo_d, v_d = run(dense)
    lo_s, v_s = run(sparse)
    np.testing.assert_allclose(lo_s, lo_d, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(v_s, v_d, rtol=1e-6, atol=1e-6)
