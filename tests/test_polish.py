"""L-BFGS polish (train/polish.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from kanodes_tpu.train.polish import PolishConfig, polish


def _rosenbrock(p):
    x, y = p["x"], p["y"]
    return jnp.sum(100.0 * (y - x ** 2) ** 2 + (1 - x) ** 2)


def test_polish_converges_rosenbrock():
    p0 = {"x": jnp.zeros(3), "y": jnp.zeros(3)}
    out = polish(_rosenbrock, p0, PolishConfig(iters=100))
    assert float(out["best_loss"]) < 1e-8
    np.testing.assert_allclose(np.asarray(out["params"]["x"]), 1.0,
                               atol=1e-4)
    assert out["loss_history"].shape == (100,)


def test_polish_never_returns_worse_than_input():
    p_opt = {"x": jnp.ones(2), "y": jnp.ones(2)}
    out = polish(_rosenbrock, p_opt, PolishConfig(iters=5))
    assert float(out["best_loss"]) <= float(_rosenbrock(p_opt))


def test_polish_beats_adam_tail_on_lv_like_least_squares():
    """A small ill-conditioned nonlinear least-squares: Adam stalls at
    its lr-wander floor, the quasi-Newton polish goes orders lower."""
    import optax

    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (20, 8)) * jnp.logspace(0, -3, 8)
    target = jax.random.normal(jax.random.PRNGKey(1), (20,))

    def loss(w):
        return jnp.mean((jnp.tanh(A @ w) - jnp.tanh(A @ w0_true)) ** 2)

    w0_true = jax.random.normal(jax.random.PRNGKey(2), (8,))
    w = jnp.zeros(8)
    opt = optax.adam(1e-2)
    st = opt.init(w)

    @jax.jit
    def step(w, st):
        g = jax.grad(loss)(w)
        up, st = opt.update(g, st)
        return optax.apply_updates(w, up), st

    for _ in range(500):
        w, st = step(w, st)
    adam_floor = float(loss(w))

    out = polish(loss, w, PolishConfig(iters=50))
    assert float(out["best_loss"]) < adam_floor * 0.5, (
        float(out["best_loss"]), adam_floor)
