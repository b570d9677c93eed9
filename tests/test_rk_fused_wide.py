"""Wide-state (input-blocked) fused RK kernels vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanodes_tpu.models import KANChain
from kanodes_tpu.ode import odeint_fixed
from kanodes_tpu.ops.rk_fused_wide import wide_chain_adapter


@pytest.fixture
def wide_setup():
    # 150-dim state: > one 128 block, not a multiple of 128
    chain = KANChain.mlp_like([150, 10, 150], grid_len=5,
                              normalizer="softsign")
    params = chain.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda a: a * 0.5, params)
    return chain, params


def test_wide_step_matches_xla(wide_setup):
    chain, params = wide_setup
    ws, advance = wide_chain_adapter(chain, block=128)
    assert ws.Ipad == 256 and ws.nb == 2
    x0 = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.3, (3, 150)), jnp.float32)
    dt = 0.05
    y = advance(params, x0, dt, 2)

    def rhs(t, u, p):
        return chain.apply(p, u)

    ts = jnp.asarray([0.0, 2 * dt])
    want = jax.vmap(lambda xi: odeint_fixed(rhs, xi, ts, params,
                                            solver="tsit5",
                                            substeps=2)[-1])(x0)
    np.testing.assert_allclose(y, want, rtol=2e-4, atol=1e-5)


def test_wide_step_gradients_match_xla(wide_setup):
    chain, params = wide_setup
    ws, advance = wide_chain_adapter(chain)
    x0 = jnp.asarray(np.random.default_rng(1).normal(
        0, 0.2, (2, 150)), jnp.float32)
    tgt = x0 * 1.01
    dt = 0.05

    def loss_wide(params):
        return jnp.mean((advance(params, x0, dt, 1) - tgt) ** 2)

    def rhs(t, u, p):
        return chain.apply(p, u)

    def loss_xla(params):
        ts = jnp.asarray([0.0, dt])
        y = jax.vmap(lambda xi: odeint_fixed(rhs, xi, ts, params,
                                             solver="tsit5")[-1])(x0)
        return jnp.mean((y - tgt) ** 2)

    gw = jax.grad(loss_wide)(params)
    gx = jax.grad(loss_xla)(params)
    for a, b in zip(jax.tree_util.tree_leaves(gw),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)
