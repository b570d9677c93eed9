"""Basis kernels vs closed forms and autodiff (SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanodes_tpu.ops import basis as B


GRID = B.make_grid(5)
H = B.default_denominator(5)
X = jnp.linspace(-0.97, 0.97, 23)


def _numpy_ref(name, x, grid, h):
    y = (np.asarray(x)[..., None] - np.asarray(grid)) / h
    if name == "rbf":
        return np.exp(-y ** 2)
    if name == "rswaf":
        return 1.0 / np.cosh(y) ** 2
    if name == "iqf":
        return 1.0 / (1.0 + y ** 2)
    raise AssertionError(name)


@pytest.mark.parametrize("name", ["rbf", "rswaf", "iqf"])
def test_closed_form(name):
    got = B.get_basis(name)(X, GRID, H)
    want = _numpy_ref(name, X, GRID, H)
    assert got.shape == (23, 5)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", ["rbf", "rswaf", "iqf"])
def test_autodiff_matches_closed_form_derivative(name):
    fn = B.get_basis(name)
    dfn = B.BASIS_DX[name]

    def scalar(x):
        return fn(x, GRID, H)

    got = jax.vmap(jax.jacfwd(scalar))(X)       # [23, 5]
    want = dfn(X, GRID, H)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["rbf", "rswaf", "iqf"])
def test_second_order_autodiff_is_finite(name):
    # KAN-PINN needs grad-of-grad through the bases
    fn = B.get_basis(name)

    def s(x):
        return jnp.sum(fn(x, GRID, H) ** 2)

    h = jax.hessian(s)(jnp.asarray(0.3))
    assert jnp.isfinite(h)


def test_rbf_peak_at_centers():
    vals = B.rbf(GRID, GRID, H)  # [5, 5]
    np.testing.assert_allclose(np.diag(vals), 1.0, rtol=1e-6)


def test_bspline_partition_of_unity():
    k = 3
    grid = B.make_bspline_grid(in_dims=2, grid_size=5, k=k)
    x = jnp.stack([jnp.linspace(-0.9, 0.9, 17),
                   jnp.linspace(-0.5, 0.5, 17)], axis=-1)  # [17, 2]
    bas = B.bspline_basis(x, grid, k)
    assert bas.shape == (17, 2, 5 + k)
    np.testing.assert_allclose(bas.sum(-1), 1.0, rtol=1e-5, atol=1e-5)
    assert bool(jnp.all(bas >= -1e-6))


def test_bspline_grad_flows():
    k = 3
    grid = B.make_bspline_grid(1, 5, k)

    def f(x):
        return jnp.sum(B.bspline_basis(x, grid, k) ** 2)

    g = jax.grad(f)(jnp.asarray([0.21]))
    assert jnp.all(jnp.isfinite(g))
