"""Whole-adaptive-solve fused kernel vs the XLA adaptive solver.

Parity target: `ode/integrate.odeint(adjoint="direct")` driven by the
SAME fused chain RHS (`kan_chain_rhs`) — identical chain arithmetic, so
the controller takes the same step sequence and values/gradients must
match to float32 tolerance. CPU = Pallas interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanodes_tpu.models import KANChain
from kanodes_tpu.ode.integrate import StepController, odeint
from kanodes_tpu.ops.kdense_pallas import chain_spec_of, fused_params, \
    kan_chain_rhs
from kanodes_tpu.ops.rk_adaptive_fused import fused_adaptive_odeint, \
    fused_adaptive_stats


@pytest.fixture
def chain():
    return KANChain.mlp_like([2, 10, 2], grid_len=5)


@pytest.fixture
def cparams(chain):
    # non-degenerate weights: near-zero init plus noise so the dynamics
    # actually bend (pure glorot/1e5 is ~linear decay)
    p = chain.init(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(p)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [0.02 * l + 0.3 * jax.random.normal(k, l.shape)
              for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


TS = jnp.arange(0.0, 3.5 + 0.05, 0.1, dtype=jnp.float32)
U0 = jnp.asarray([1.0, 1.0], jnp.float32)


def _fused_solve(chain, params, ts, *, solver="tsit5", rtol=1e-3,
                 atol=1e-6, max_steps=96):
    spec = chain_spec_of(chain)
    ys = fused_adaptive_odeint(spec, solver, rtol, atol, max_steps,
                               StepController(), None, U0[None], ts,
                               *fused_params(params), True)
    return ys[:, 0, :]


def _xla_solve(chain, params, ts, *, solver="tsit5", rtol=1e-3,
               atol=1e-6, max_steps=96):
    rhs = kan_chain_rhs(chain, interpret=True)
    return odeint(rhs, U0, ts, params, solver=solver, rtol=rtol,
                  atol=atol, max_steps=max_steps, adjoint="direct")


@pytest.mark.parametrize("solver", ["tsit5", "bs3"])
def test_forward_matches_direct(chain, cparams, solver):
    ys_f = _fused_solve(chain, cparams, TS, solver=solver)
    ys_x = _xla_solve(chain, cparams, TS, solver=solver)
    np.testing.assert_allclose(ys_f, ys_x, rtol=2e-5, atol=2e-5)


def test_gradient_matches_direct(chain, cparams):
    tgt = jnp.cos(jnp.stack([TS, 2 * TS], axis=-1))

    def loss_f(params):
        return jnp.mean((_fused_solve(chain, params, TS) - tgt) ** 2)

    def loss_x(params):
        return jnp.mean((_xla_solve(chain, params, TS) - tgt) ** 2)

    gf = jax.grad(loss_f)(cparams)
    gx = jax.grad(loss_x)(cparams)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6)


def test_x0_gradient_matches_direct(chain, cparams):
    spec = chain_spec_of(chain)
    rhs = kan_chain_rhs(chain, interpret=True)
    ts = TS[:12]

    def loss_f(u0):
        ys = fused_adaptive_odeint(spec, "tsit5", 1e-3, 1e-6, 64,
                                   StepController(), None, u0[None], ts,
                                   *fused_params(cparams), True)
        return jnp.sum(ys[:, 0, :] ** 2)

    def loss_x(u0):
        ys = odeint(rhs, u0, ts, cparams, rtol=1e-3, atol=1e-6,
                    max_steps=64, adjoint="direct")
        return jnp.sum(ys ** 2)

    gf = jax.grad(loss_f)(U0)
    gx = jax.grad(loss_x)(U0)
    np.testing.assert_allclose(gf, gx, rtol=5e-4, atol=1e-6)


def test_unreached_fill_parity(chain, cparams):
    """max_steps too small: both paths must fill the unreached save rows
    with the final integrated state, and gradients must still agree."""
    ms = 6
    ys_f = _fused_solve(chain, cparams, TS, max_steps=ms)
    ys_x = _xla_solve(chain, cparams, TS, max_steps=ms)
    np.testing.assert_allclose(ys_f, ys_x, rtol=2e-5, atol=2e-5)

    def loss_f(params):
        return jnp.sum(_fused_solve(chain, params, TS, max_steps=ms)
                       ** 2)

    def loss_x(params):
        return jnp.sum(_xla_solve(chain, params, TS, max_steps=ms) ** 2)

    gf = jax.grad(loss_f)(cparams)
    gx = jax.grad(loss_x)(cparams)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6)


def test_stats_and_success(chain, cparams):
    spec = chain_spec_of(chain)
    ys, stats = fused_adaptive_stats(spec, "tsit5", 1e-3, 1e-6, 96,
                                     StepController(), None, U0[None],
                                     TS, *fused_params(cparams), True)
    assert bool(stats["success"])
    # save clipping floors accepted steps at one per save interval
    assert int(stats["n_accept"]) >= TS.shape[0] - 1
    assert int(stats["n_iter"]) <= 96
    assert ys.shape == (TS.shape[0], 1, 2)


def test_batched_states(chain, cparams):
    """K>1: fused adaptive advances a batch of ICs in one solve; each
    row must match its own single-IC XLA solve (the controller sees the
    JOINT error norm, so compare against a batched XLA reference)."""
    spec = chain_spec_of(chain)
    rhs = kan_chain_rhs(chain, interpret=True)
    x0 = jnp.asarray([[1.0, 1.0], [0.5, 1.5], [1.2, 0.3]], jnp.float32)
    ts = TS[:10]
    ys_f = fused_adaptive_odeint(spec, "tsit5", 1e-3, 1e-6, 64,
                                 StepController(), None, x0, ts,
                                 *fused_params(cparams), True)
    ys_x = odeint(rhs, x0, ts, cparams, rtol=1e-3, atol=1e-6,
                  max_steps=64, adjoint="direct")
    np.testing.assert_allclose(ys_f, ys_x, rtol=2e-5, atol=2e-5)


def test_lv_driver_fused_adaptive_smoke():
    """experiments/lv.py wiring: a few adaptive-fused training steps."""
    from kanodes_tpu.experiments.lv import LVConfig, run
    cfg = LVConfig(solve_mode="adaptive", impl="fused", iters=5,
                   eval_every=5, max_steps=96, rtol=1e-3, atol=1e-6)
    out = run(cfg)
    assert np.isfinite(float(out["loss_history"][-1]))
    assert np.isfinite(float(out["eval_history"][-1]))
