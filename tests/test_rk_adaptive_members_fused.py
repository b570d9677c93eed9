"""Per-member fused adaptive kernel vs `ode.odeint_members`.

`fused_adaptive_members_odeint` folds the whole per-member controller
loop (one independent save-clipped I/PI controller per packed member)
into one forward + one backward kernel launch. Parity target:
`odeint_members` driven by the same fused chain RHS over the same
packed block-diagonal params — identical chain arithmetic, so the
per-member step sequences must match to float32 tolerance. CPU =
Pallas interpret mode. Member isolation is additionally checked
against the SINGLE-member fused kernel run per member.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanodes_tpu.models import KANChain
from kanodes_tpu.models.packed import (member_mean, pack_chain,
                                       pack_params, tile_state)
from kanodes_tpu.ode.integrate import StepController, odeint_members
from kanodes_tpu.ops.kdense_pallas import (chain_spec_of, fused_params,
                                           kan_chain_rhs)
from kanodes_tpu.ops.rk_adaptive_fused import (
    fused_adaptive_members_odeint, fused_adaptive_members_stats,
    fused_adaptive_odeint)

S = 3
TS = jnp.arange(0.0, 2.0 + 0.05, 0.1, dtype=jnp.float32)
U0 = jnp.asarray([1.0, 1.0], jnp.float32)


@pytest.fixture
def chain():
    return KANChain.mlp_like([2, 10, 2], grid_len=5)


@pytest.fixture
def members(chain):
    """S member param trees with genuinely different dynamics."""
    out = []
    for s in range(S):
        p = chain.init(jax.random.PRNGKey(s))
        leaves, treedef = jax.tree_util.tree_flatten(p)
        keys = jax.random.split(jax.random.PRNGKey(100 + s), len(leaves))
        leaves = [0.02 * l + (0.2 + 0.1 * s) * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, keys)]
        out.append(jax.tree_util.tree_unflatten(treedef, leaves))
    return out


def _packed(chain, members):
    pm = pack_chain(chain, S)
    return pm, pack_params(chain, members)


def _fused_members(pm, pparams, ts, *, max_steps=96, dt0=None):
    spec = chain_spec_of(pm)
    u0 = tile_state(U0, S)
    ys = fused_adaptive_members_odeint(
        spec, "tsit5", 1e-3, 1e-6, max_steps, StepController(), dt0,
        S, u0[None], ts, *fused_params(pparams), True)
    return ys[:, 0, :]


def _xla_members(pm, pparams, ts, *, max_steps=96, dt0=None):
    rhs = kan_chain_rhs(pm, interpret=True)
    u0 = tile_state(U0, S)
    return odeint_members(rhs, u0, ts, pparams, n_members=S,
                          solver="tsit5", rtol=1e-3, atol=1e-6,
                          dt0=dt0, max_steps=max_steps)


def test_forward_matches_odeint_members(chain, members):
    pm, pparams = _packed(chain, members)
    ys_f = _fused_members(pm, pparams, TS)
    ys_x = _xla_members(pm, pparams, TS)
    np.testing.assert_allclose(ys_f, ys_x, rtol=2e-5, atol=2e-5)


def test_member_isolation_vs_single_kernel(chain, members):
    """Each member's block equals its OWN single-member fused solve —
    per-member controllers are truly independent."""
    pm, pparams = _packed(chain, members)
    ys_f = _fused_members(pm, pparams, TS)
    spec1 = chain_spec_of(chain)
    for s in range(S):
        ys_1 = fused_adaptive_odeint(
            spec1, "tsit5", 1e-3, 1e-6, 96, StepController(), None,
            U0[None], TS, *fused_params(members[s]), True)[:, 0, :]
        np.testing.assert_allclose(ys_f[:, 2 * s:2 * s + 2], ys_1,
                                   rtol=2e-5, atol=2e-5)


def test_gradient_matches_odeint_members(chain, members):
    pm, pparams = _packed(chain, members)
    tgt = tile_state(jnp.cos(jnp.stack([TS, 2 * TS], axis=-1)), S)
    reduce = member_mean(S)

    def loss_f(params):
        return reduce((_fused_members(pm, params, TS) - tgt) ** 2).sum()

    def loss_x(params):
        return reduce((_xla_members(pm, params, TS) - tgt) ** 2).sum()

    gf = jax.grad(loss_f)(pparams)
    gx = jax.grad(loss_x)(pparams)
    # kernel-vs-XLA tolerance: the packed GEMMs sum 3x more terms than
    # the single-member kernel's (a handful of elements land ~2e-3 rel);
    # member LOGIC is exactness-checked against the single-member
    # kernel in test_member_grad_isolation below
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-5)


def test_member_grad_isolation(chain, members):
    """Packed-kernel gradients equal each member's OWN single-member
    fused-kernel gradients (same kernel arithmetic family) — the
    per-member adjoint never couples members."""
    from kanodes_tpu.models.packed import extract_member
    pm, pparams = _packed(chain, members)
    tgt = jnp.cos(jnp.stack([TS, 2 * TS], axis=-1))
    reduce = member_mean(S)

    def loss_f(params):
        return reduce((_fused_members(pm, params, TS)
                       - tile_state(tgt, S)) ** 2).sum()

    gf = jax.grad(loss_f)(pparams)
    spec1 = chain_spec_of(chain)

    def loss_1(params):
        ys = fused_adaptive_odeint(
            spec1, "tsit5", 1e-3, 1e-6, 96, StepController(), None,
            U0[None], TS, *fused_params(params), True)[:, 0, :]
        return jnp.mean((ys - tgt) ** 2)

    for s in range(S):
        g1 = jax.grad(loss_1)(members[s])
        gm = extract_member(chain, gf, S, s)
        for a, b in zip(jax.tree_util.tree_leaves(gm),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-5)


def test_unreached_fill_and_gradient(chain, members):
    """max_steps too small: per-member fill rows match odeint_members
    and gradients still agree through the fill path."""
    ms = 8
    pm, pparams = _packed(chain, members)
    ys_f = _fused_members(pm, pparams, TS, max_steps=ms)
    ys_x = _xla_members(pm, pparams, TS, max_steps=ms)
    np.testing.assert_allclose(ys_f, ys_x, rtol=2e-5, atol=2e-5)

    def loss_f(params):
        return jnp.sum(_fused_members(pm, params, TS, max_steps=ms) ** 2)

    def loss_x(params):
        return jnp.sum(_xla_members(pm, params, TS, max_steps=ms) ** 2)

    gf = jax.grad(loss_f)(pparams)
    gx = jax.grad(loss_x)(pparams)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-5)


def test_member_stats_match(chain, members):
    pm, pparams = _packed(chain, members)
    spec = chain_spec_of(pm)
    u0 = tile_state(U0, S)
    ys, st = fused_adaptive_members_stats(
        spec, "tsit5", 1e-3, 1e-6, 96, StepController(), None, S,
        u0[None], TS, *fused_params(pparams), True)
    rhs = kan_chain_rhs(pm, interpret=True)
    _, st_x = odeint_members(rhs, u0, TS, pparams, n_members=S,
                             solver="tsit5", rtol=1e-3, atol=1e-6,
                             max_steps=96, return_stats=True)
    np.testing.assert_array_equal(np.asarray(st["n_accept"]),
                                  np.asarray(st_x.n_accept))
    np.testing.assert_array_equal(np.asarray(st["n_reject"]),
                                  np.asarray(st_x.n_reject))
    assert bool(np.all(np.asarray(st["success"])))
    # save clipping floors accepted steps at one per save interval
    assert int(np.asarray(st["n_accept"]).min()) >= TS.shape[0] - 1


def test_x0_gradient_matches(chain, members):
    pm, pparams = _packed(chain, members)
    spec = chain_spec_of(pm)
    rhs = kan_chain_rhs(pm, interpret=True)
    ts = TS[:12]

    def loss_f(u0):
        ys = fused_adaptive_members_odeint(
            spec, "tsit5", 1e-3, 1e-6, 64, StepController(), None, S,
            u0[None], ts, *fused_params(pparams), True)
        return jnp.sum(ys[:, 0, :] ** 2)

    def loss_x(u0):
        ys = odeint_members(rhs, u0, ts, pparams, n_members=S,
                            solver="tsit5", rtol=1e-3, atol=1e-6,
                            max_steps=64)
        return jnp.sum(ys ** 2)

    u0 = tile_state(U0, S)
    gf = jax.grad(loss_f)(u0)
    gx = jax.grad(loss_x)(u0)
    np.testing.assert_allclose(gf, gx, rtol=5e-4, atol=3e-6)


def test_validation():
    ch = KANChain.mlp_like([2, 4, 2], grid_len=4)
    pm = pack_chain(ch, 2)
    spec = chain_spec_of(pm)
    p = pack_params(ch, [ch.init(jax.random.PRNGKey(0))] * 2)
    with pytest.raises(ValueError, match="divisible"):
        fused_adaptive_members_odeint(
            spec, "tsit5", 1e-3, 1e-6, 16, StepController(), None, 3,
            tile_state(U0, 2)[None], TS[:4], *fused_params(p), True)
    with pytest.raises(ValueError, match="FSAL"):
        fused_adaptive_members_odeint(
            spec, "rk4", 1e-3, 1e-6, 16, StepController(), None, 2,
            tile_state(U0, 2)[None], TS[:4], *fused_params(p), True)
