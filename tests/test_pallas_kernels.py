"""Fused Pallas KDense kernels vs the XLA reference implementation.

On CPU these run in Pallas interpret mode — same kernel code, same
semantics; the compiled TPU path is exercised by bench/experiments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanodes_tpu.models import KDense, KANChain
from kanodes_tpu.ops.kdense_pallas import (ChainSpec, chain_spec_of,
                                           fused_params, kan_chain_apply,
                                           kan_chain_rhs, kdense_pallas)


@pytest.fixture
def chain():
    return KANChain.mlp_like([2, 10, 2], grid_len=5)


@pytest.fixture
def cparams(chain):
    return chain.init(jax.random.PRNGKey(0))


def test_chain_forward_matches_xla(chain, cparams):
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 2))
    spec = chain_spec_of(chain)
    y_pal = kan_chain_apply(spec, x, *fused_params(cparams), True)
    y_xla = chain.apply(cparams, x)
    np.testing.assert_allclose(y_pal, y_xla, rtol=1e-5, atol=1e-6)


def test_chain_backward_matches_xla(chain, cparams):
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 2))
    spec = chain_spec_of(chain)

    def loss_pal(params, x):
        y = kan_chain_apply(spec, x, *fused_params(params), True)
        return jnp.sum(jnp.sin(y) * y)

    def loss_xla(params, x):
        y = chain.apply(params, x)
        return jnp.sum(jnp.sin(y) * y)

    gp = jax.grad(loss_pal, argnums=(0, 1))(cparams, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(cparams, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_chain_rhs_single_and_batched(chain, cparams):
    rhs = kan_chain_rhs(chain, interpret=True)
    u1 = jnp.asarray([0.5, 1.5])
    out1 = rhs(0.0, u1, cparams)
    assert out1.shape == (2,)
    ub = jnp.stack([u1, 2 * u1])
    outb = rhs(0.0, ub, cparams)
    np.testing.assert_allclose(outb[0], out1, rtol=1e-5, atol=1e-6)


def test_single_layer_dispatch_matches_xla():
    l = KDense(3, 7, 5)
    p = l.init(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 3))
    y_pal = kdense_pallas(l, p, x)
    y_xla = l.apply(p, x)
    np.testing.assert_allclose(y_pal, y_xla, rtol=1e-5, atol=1e-6)


def test_single_layer_grad_matches_xla():
    l = KDense(2, 4, 6)
    p = l.init(jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 2))

    def f(p, x, impl):
        return jnp.sum(l.apply(p, x, impl=impl) ** 2)

    gp = jax.grad(lambda p: f(p, x, "pallas"))(p)
    gx = jax.grad(lambda p: f(p, x, "xla"))(p)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_fused_path_rejects_unsupported_config():
    # global bases stay XLA-only (local rbf/iqf/rswaf are fused)
    bad = KANChain.mlp_like([2, 5, 2], grid_len=5, basis="cheby")
    with pytest.raises(ValueError):
        chain_spec_of(bad)


@pytest.mark.parametrize("basis", ["iqf", "rswaf"])
def test_fused_chain_alt_basis_matches_xla(basis):
    """The fused kernels support all three LOCAL bases; forward and
    gradients must match the XLA path per basis."""
    chain = KANChain.mlp_like([2, 10, 2], grid_len=5, basis=basis)
    cparams = chain.init(jax.random.PRNGKey(7))
    spec = chain_spec_of(chain)
    assert spec.basis == basis
    x = jax.random.normal(jax.random.PRNGKey(8), (6, 2))
    y_pal = kan_chain_apply(spec, x, *fused_params(cparams), True)
    np.testing.assert_allclose(y_pal, chain.apply(cparams, x),
                               rtol=1e-5, atol=1e-6)

    def loss_pal(params, x):
        y = kan_chain_apply(spec, x, *fused_params(params), True)
        return jnp.sum(jnp.sin(y) * y)

    def loss_xla(params, x):
        return jnp.sum(jnp.sin(chain.apply(params, x))
                       * chain.apply(params, x))

    gp = jax.grad(loss_pal, argnums=(0, 1))(cparams, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(cparams, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_ode_solve_with_fused_rhs_matches_xla(chain, cparams):
    from kanodes_tpu.ode import odeint_fixed
    rhs_pal = kan_chain_rhs(chain, interpret=True)

    def rhs_xla(t, u, p):
        return chain.apply(p, u)

    ts = jnp.linspace(0.0, 1.0, 6)
    u0 = jnp.asarray([1.0, 1.0])
    # scale params so dynamics are nontrivial
    params = jax.tree_util.tree_map(lambda a: a * 0.5, cparams)
    y_pal = odeint_fixed(rhs_pal, u0, ts, params, solver="tsit5")
    y_xla = odeint_fixed(rhs_xla, u0, ts, params, solver="tsit5")
    np.testing.assert_allclose(y_pal, y_xla, rtol=1e-5, atol=1e-6)

    def loss(p, rhs):
        return jnp.sum(odeint_fixed(rhs, u0, ts, p, solver="tsit5") ** 2)

    gp = jax.grad(lambda p: loss(p, rhs_pal))(params)
    gx = jax.grad(lambda p: loss(p, rhs_xla))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)


def test_softsign_normalizer_chain_matches_xla():
    chain = KANChain.mlp_like([3, 6, 3], grid_len=5, normalizer="softsign")
    params = chain.init(jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(8), (5, 3))
    spec = chain_spec_of(chain)
    y_pal = kan_chain_apply(spec, x, *fused_params(params), True)
    np.testing.assert_allclose(y_pal, chain.apply(params, x),
                               rtol=1e-5, atol=1e-6)

    def loss_pal(p):
        return jnp.sum(kan_chain_apply(spec, x, *fused_params(p), True) ** 2)

    def loss_xla(p):
        return jnp.sum(chain.apply(p, x) ** 2)

    gp = jax.grad(loss_pal)(params)
    gx = jax.grad(loss_xla)(params)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
