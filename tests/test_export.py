"""jax.export model serialization round-trips."""

import jax
import jax.numpy as jnp
import numpy as np

from kanodes_tpu.models import KANChain
from kanodes_tpu.utils.export import (export_forward, load_forward,
                                      export_rollout)


def test_forward_roundtrip():
    chain = KANChain.mlp_like([2, 6, 2], grid_len=5)
    params = chain.init(jax.random.PRNGKey(0))
    x = jnp.asarray([[0.5, 1.5], [2.0, 0.1]])
    blob = export_forward(chain.apply, params, x)
    assert isinstance(blob, bytes) and len(blob) > 100
    f = load_forward(blob)
    np.testing.assert_allclose(f(params, x), chain.apply(params, x),
                               rtol=1e-6)


def test_rollout_roundtrip():
    chain = KANChain.mlp_like([2, 6, 2], grid_len=5)
    params = jax.tree_util.tree_map(
        lambda a: a * 0.3, chain.init(jax.random.PRNGKey(1)))
    ts = jnp.linspace(0.0, 1.0, 6)
    u0 = jnp.asarray([1.0, 1.0])
    blob = export_rollout(chain, ts, u0, params)
    f = load_forward(blob)
    out = f(params, u0)
    assert out.shape == (6, 2)
    from kanodes_tpu.ode import odeint_fixed

    def rhs(t, u, p):
        return chain.apply(p, u)

    want = odeint_fixed(rhs, u0, ts, params, solver="tsit5")
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
