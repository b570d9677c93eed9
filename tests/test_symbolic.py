"""Symbolic regression engine + post-pass (native C++ GP via ctypes)."""

import numpy as np
import pytest

from kanodes_tpu.symbolic.engine import fit_expression
from kanodes_tpu.symbolic.fit import (simplify_expression,
                                      fit_scalar_function,
                                      resimulate_symbolic_rhs)


def test_recovers_fisher_kpp_source():
    # truth r*u*(1-u) (Fisher-KPP_Source.jl:234 recovers 0.9953x(1.0024-x))
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, 300)
    y = x * (1 - x)
    fit = fit_expression(x, y, ops=("+", "-", "*", "/"),
                         generations=150, restarts=2, seed=1)
    assert fit.mse < 1e-6, (fit.expression, fit.mse)
    # evaluates correctly
    np.testing.assert_allclose(fit(x), y, atol=1e-3)


def test_recovers_allen_cahn_source():
    # truth 5u - 5u^3 (Allen-Cahn_Source.jl:227)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, 300)
    y = 5 * x - 5 * x ** 3
    fit = fit_expression(x, y, ops=("+", "-", "*", "/"),
                         generations=150, restarts=2, seed=2)
    assert fit.mse < 1e-5, (fit.expression, fit.mse)


def test_two_variable_recovery():
    # LV-style term: 1.5x - xy
    rng = np.random.default_rng(2)
    X = rng.uniform(0, 3, (300, 2))
    y = 1.5 * X[:, 0] - X[:, 0] * X[:, 1]
    fit = fit_expression(X, y, ops=("+", "-", "*", "/"),
                         generations=250, restarts=3, seed=3)
    assert fit.mse < 1e-4, (fit.expression, fit.mse)


def test_fit_pareto_front():
    """The engine's Pareto archive: strictly improving MSE with size,
    and the true 2-term law appears as a compact front member."""
    from kanodes_tpu.symbolic.engine import fit_pareto
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 2.0, (250, 1))
    y = 1.5 * x[:, 0] - x[:, 0] ** 2
    front = fit_pareto(x, y, ops=("+", "-", "*"), population=256,
                       generations=150, restarts=2, seed=5)
    assert len(front) >= 2
    sizes = [f.size for f in front]
    mses = [f.mse for f in front]
    assert sizes == sorted(sizes)
    assert all(b < a for a, b in zip(mses, mses[1:]))   # strict dominance
    # a compact member nails the law (LM-refined constants)
    good = [f for f in front if f.mse < 1e-10 and f.size <= 9]
    assert good, front


def test_simplify_expression():
    s = simplify_expression("((x0 - x0) - ((x0 + ((x0 - (x0 + x0)) / x0)) * x0))")
    # should reduce to x0 - x0**2 (i.e. x0*(1-x0))
    import sympy
    diff = sympy.simplify(sympy.sympify(s) - sympy.sympify("x0 - x0**2"))
    assert diff == 0, s


def test_fit_scalar_function():
    fit = fit_scalar_function(lambda u: 2.0 * u * (1 - u), 0.0, 1.0,
                              generations=120, restarts=2, seed=4)
    assert fit.mse < 1e-5


def test_resimulate_symbolic_rhs():
    # the paper's recovered LV ODE (Plotting_symbolic.jl:221-222)
    exprs = ["1.495*x0 - 0.986*x0*x1", "0.970*x0*x1 - 2.929*x1"]
    ts = np.linspace(0.0, 3.5, 36)
    ys = resimulate_symbolic_rhs(exprs, [1.0, 1.0], ts, 2)
    assert ys.shape == (36, 2)
    assert np.isfinite(np.asarray(ys)).all()
    # close to the true LV trajectory
    from kanodes_tpu.experiments.lv import LVConfig, make_data
    data = make_data(LVConfig())
    X = np.asarray(data["X"])[:36]
    assert float(np.mean((np.asarray(ys) - X) ** 2)) < 0.05
