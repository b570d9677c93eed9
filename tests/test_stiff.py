"""Implicit ESDIRK solver: accuracy + stability beyond the explicit bound."""

import jax.numpy as jnp
import numpy as np
import pytest

from kanodes_tpu.ode.stiff import odeint_implicit
from kanodes_tpu.ode import odeint_fixed


def test_accuracy_on_smooth_problem():
    # y' = -y, exact decay
    ts = jnp.linspace(0.0, 2.0, 9)
    ys = odeint_implicit(lambda t, y, a: -y, jnp.ones(1), ts, substeps=4)
    np.testing.assert_allclose(ys[:, 0], np.exp(-np.asarray(ts)),
                               rtol=2e-4)


def test_convergence_order():
    ts = jnp.asarray([0.0, 1.0])
    errs = []
    for sub in (4, 8):
        ys = odeint_implicit(lambda t, y, a: -y, jnp.ones(1), ts,
                             substeps=sub, newton_iters=8)
        errs.append(abs(float(ys[-1, 0]) - np.exp(-1.0)))
    rate = np.log2(errs[0] / max(errs[1], 1e-12))
    assert rate > 2.2, (errs, rate)     # 3rd order (f32 floors it a bit)


def test_stability_on_stiff_system():
    """lambda = -1000 with dt = 0.1: explicit RK4 explodes, ESDIRK is
    L-stable and lands on the slow manifold."""
    lam = -1000.0

    def rhs(t, y, a):
        return jnp.stack([lam * (y[0] - jnp.cos(t)) - jnp.sin(t),
                          -y[1]])

    y0 = jnp.asarray([2.0, 1.0])
    ts = jnp.linspace(0.0, 1.0, 11)
    ys = odeint_implicit(rhs, y0, ts, substeps=1, newton_iters=6)
    assert bool(jnp.all(jnp.isfinite(ys)))
    # fast component relaxes to cos(t)
    np.testing.assert_allclose(ys[-1, 0], np.cos(1.0), atol=5e-3)
    # explicit solver at the same step size blows up
    ys_exp = odeint_fixed(rhs, y0, ts, None, solver="rk4", substeps=1)
    assert not bool(jnp.all(jnp.abs(ys_exp) < 1e3))


def test_gradient_flows_through_implicit_solve():
    import jax

    def loss(a):
        ys = odeint_implicit(lambda t, y, aa: aa * y, jnp.ones(1),
                             jnp.asarray([0.0, 1.0]), a, substeps=4)
        return ys[-1, 0]

    g = jax.grad(loss)(jnp.asarray(-1.0))
    # d/da exp(a) at a=-1 -> exp(-1)
    np.testing.assert_allclose(float(g), np.exp(-1.0), rtol=5e-3)
