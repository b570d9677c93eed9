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


def test_wide_multistep_matches_stepwise(wide_setup):
    """One-launch multistep kernel == scan of single-step kernels,
    values AND parameter gradients (same math, different launch
    granularity)."""
    chain, params = wide_setup
    _, adv_multi = wide_chain_adapter(chain, multistep=True)
    _, adv_step = wide_chain_adapter(chain, multistep=False)
    x0 = jnp.asarray(np.random.default_rng(2).normal(
        0, 0.25, (4, 150)), jnp.float32)
    dt, n = 0.04, 5

    y_m = adv_multi(params, x0, dt, n)
    y_s = adv_step(params, x0, dt, n)
    np.testing.assert_allclose(y_m, y_s, rtol=1e-5, atol=1e-6)

    tgt = x0 * 0.98

    def lm(p):
        return jnp.mean((adv_multi(p, x0, dt, n) - tgt) ** 2)

    def ls(p):
        return jnp.mean((adv_step(p, x0, dt, n) - tgt) ** 2)

    gm = jax.grad(lm)(params)
    gs = jax.grad(ls)(params)
    for a, b in zip(jax.tree_util.tree_leaves(gm),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_wide_multistep_full_history_cotangents(wide_setup):
    """Trajectory-style loss touching EVERY saved state flows correct
    cotangents through the single backward launch."""
    from kanodes_tpu.ops.kdense_pallas import chain_spec_of, fused_params
    from kanodes_tpu.ops.rk_fused_wide import (WideSpec,
                                               fused_rk_multistep_wide,
                                               fused_rk_step_wide)
    chain, params = wide_setup
    ws = WideSpec(chain_spec_of(chain))
    c1, w1, c2, w2 = fused_params(params)
    pp = ws.pad_params(c1, w1, c2, w2)
    x0 = jnp.pad(jnp.asarray(np.random.default_rng(3).normal(
        0, 0.2, (2, 150)), jnp.float32), ((0, 0), (0, ws.Ipad - 150)))
    dt, n = 0.03, 4

    def loss_multi(pp):
        ys = fused_rk_multistep_wide(ws, "tsit5", dt, n, x0, *pp)
        return jnp.mean(ys[:, :, :150] ** 2)

    def loss_step(pp):
        acc = 0.0
        x = x0
        for _ in range(n):
            x = fused_rk_step_wide(ws, "tsit5", dt, x, *pp)
            acc = acc + jnp.mean(x[:, :150] ** 2)
        return acc / n

    np.testing.assert_allclose(loss_multi(pp), loss_step(pp),
                               rtol=1e-6, atol=1e-8)
    gm = jax.grad(loss_multi)(pp)
    gs = jax.grad(loss_step)(pp)
    for a, b in zip(gm, gs):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("solver", ["rk4", "tsit5"])
def test_lowrank_backward_matches_standard(wide_setup, solver):
    """K=1 low-rank step-Jacobian backward (J = I + U Ds (I-L)^-1 V,
    rank S*H through the hidden layer) == the stage-by-stage discrete
    adjoint, for params AND the initial state, on both tableaus.
    Cotangents cover every saved step (the trajectory-mode shape)."""
    from kanodes_tpu.ops.kdense_pallas import fused_params
    from kanodes_tpu.ops.rk_fused_wide import (WideSpec,
                                               fused_rk_multistep_wide,
                                               wide_chain_adapter)
    chain, params = wide_setup
    ws, _ = wide_chain_adapter(chain, solver=solver)
    c1p, w1p, c2p, w2p = ws.pad_params(*fused_params(params))
    x0 = jnp.pad(jnp.asarray(np.random.default_rng(7).normal(
        0, 0.25, (1, 150)), jnp.float32), ((0, 0), (0, ws.Ipad - 150)))
    dt, n = 0.04, 8
    w = jnp.asarray(np.random.default_rng(8).normal(
        0, 1.0, (n, 1, ws.Ipad)), jnp.float32)

    def loss(lr_flag, x, *fp):
        ys = fused_rk_multistep_wide(ws, solver, dt, n, x, *fp,
                                     None, lr_flag)
        return jnp.sum(ys * w) + jnp.mean(ys ** 2)

    g_old = jax.grad(lambda *a: loss(False, *a),
                     argnums=(0, 1, 2, 3, 4))(x0, c1p, w1p, c2p, w2p)
    g_new = jax.grad(lambda *a: loss(True, *a),
                     argnums=(0, 1, 2, 3, 4))(x0, c1p, w1p, c2p, w2p)
    for a, b in zip(g_old, g_new):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=3e-6)


def test_lowrank_rejects_batched_state(wide_setup):
    from kanodes_tpu.ops.kdense_pallas import fused_params
    from kanodes_tpu.ops.rk_fused_wide import (fused_rk_multistep_wide,
                                               wide_chain_adapter)
    chain, params = wide_setup
    ws, _ = wide_chain_adapter(chain)
    pp = ws.pad_params(*fused_params(params))
    x0 = jnp.zeros((2, ws.Ipad), jnp.float32)

    def loss(x):
        ys = fused_rk_multistep_wide(ws, "rk4", 0.01, 2, x, *pp,
                                     None, True)
        return jnp.mean(ys ** 2)

    with pytest.raises(ValueError, match="K == 1"):
        jax.grad(loss)(x0)


def test_vpu_forward_matches_mxu_step_path(wide_setup):
    """K=1 multistep forward (VPU wide dot, exact f32) == the
    single-step kernel forward (MXU HIGHEST dot) up to f32
    reassociation — the VPU path must not be a precision trade."""
    from kanodes_tpu.ops.kdense_pallas import chain_spec_of, fused_params
    from kanodes_tpu.ops.rk_fused_wide import (WideSpec,
                                               fused_rk_multistep_wide,
                                               fused_rk_step_wide)
    chain, params = wide_setup
    ws = WideSpec(chain_spec_of(chain))
    pp = ws.pad_params(*fused_params(params))
    x0 = jnp.pad(jnp.asarray(np.random.default_rng(11).normal(
        0, 0.25, (1, 150)), jnp.float32), ((0, 0), (0, ws.Ipad - 150)))
    dt, n = 0.04, 6
    ys = fused_rk_multistep_wide(ws, "tsit5", dt, n, x0, *pp)
    x = x0
    for s in range(n):
        x = fused_rk_step_wide(ws, "tsit5", dt, x, *pp)
        np.testing.assert_allclose(np.asarray(ys[s]), np.asarray(x),
                                   rtol=2e-6, atol=1e-7)


def test_bwd_precision_option_threads(wide_setup):
    """bwd_precision="bf16" must produce gradients agreeing with
    "highest" (identical math in CPU interpret mode; on TPU the bf16
    backward is validated end-to-end by the full-budget surrogate
    runs, see EXPERIMENTS.md)."""
    from kanodes_tpu.ops.kdense_pallas import chain_spec_of, fused_params
    from kanodes_tpu.ops.rk_fused_wide import (WideSpec,
                                               fused_rk_multistep_wide)
    chain, params = wide_setup
    ws = WideSpec(chain_spec_of(chain))
    pp = ws.pad_params(*fused_params(params))
    x0 = jnp.pad(jnp.asarray(np.random.default_rng(12).normal(
        0, 0.25, (1, 150)), jnp.float32), ((0, 0), (0, ws.Ipad - 150)))

    def loss(bp, x, c1p, w1p, c2p, w2p):
        ys = fused_rk_multistep_wide(ws, "rk4", 0.02, 4, x,
                                     c1p, w1p, c2p, w2p, None, None, bp)
        return jnp.mean(ys ** 2)

    g_hi = jax.grad(lambda *a: loss("highest", *a),
                    argnums=(0, 1, 2, 3, 4))(x0, *pp)
    g_bf = jax.grad(lambda *a: loss("bf16", *a),
                    argnums=(0, 1, 2, 3, 4))(x0, *pp)
    for a, b in zip(g_hi, g_bf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)
