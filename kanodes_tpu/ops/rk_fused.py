"""Whole-RK-step fused Pallas kernels for KAN-chain neural ODEs.

Profiling on v5e shows a ~6-14 us fixed cost per XLA fusion group /
Pallas kernel launch inside a `lax.scan`, while the actual math of this
workload (stage evals on [K<=34, 10] tensors) is ~100 ns — i.e. a Tsit5
step built from separate ops pays ~6 stage-boundary overheads x ~3
fusion groups each. This module folds ONE ENTIRE RK STEP (all stages of
the tableau + the solution combination) over the fused 2-layer KDense
chain into a single forward kernel, and the whole discrete adjoint of
that step into a single backward kernel:

    per training iteration (shooting mode):  ~2 kernel launches
    per trajectory step:                     2 launches instead of ~36

Stage structure is unrolled at trace time (tableaus are static); stages
whose output is never consumed (e.g. the FSAL 7th stage of Tsit5 in
fixed-step mode, whose b-weight is 0) are pruned automatically.

The backward kernel recomputes the stage states (cheaper than storing
them at these sizes) and runs the standard reverse-RK recursion:
    x_bar     = g ;  kbar_i = dt * b_i * g
    for i = s-1 .. 0:
        (dx_i, dtheta_i) = vjp_chain(x_i, kbar_i)
        x_bar += dx_i ;  kbar_j += dt * a_ij * dx_i  (j < i)

Replaces: backprop-through-Tsit5 via Zygote (`LV_driver_KANODE.jl:284`)
/ torchdiffeq autograd — as two hand-fused TPU kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from kanodes_tpu.ode.tableaus import Tableau, get_tableau
from kanodes_tpu.ops.kdense_pallas import (ChainSpec, _interpret_default,
                                           _layer_fwd, _layer_bwd,
                                           _swish, _dswish, _dnorm,
                                           _basis_du,
                                           _PREC, _BWD_PRECS, _prec_ctx,
                                           check_bwd_precision)

Array = jax.Array


def _needed_stages(tab: Tableau) -> list[bool]:
    s = tab.stages
    needed = [False] * s
    for i in range(s):
        if tab.b[i] != 0.0:
            needed[i] = True
    # propagate: a stage is needed if any needed stage consumes it
    changed = True
    while changed:
        changed = False
        for i in range(s):
            if not needed[i]:
                continue
            for j in range(i):
                if tab.a[i][j] != 0.0 and not needed[j]:
                    needed[j] = True
                    changed = True
    return needed


def _chain_f(x, c1, w1, c2, w2, g1, g2, e1, e2, h, normalizer="tanh",
             basis_kind="rbf"):
    """2-layer KDense chain forward (returns y2 and the y1 intermediate)."""
    y1, _, _ = _layer_fwd(x, c1, w1, g1, h, e1, normalizer, basis_kind)
    y2, _, _ = _layer_fwd(y1, c2, w2, g2, h, e2, normalizer, basis_kind)
    return y2, y1


def _chain_vjp(x, y1, c1, w1, c2, w2, g1, g2, e1, e2, s1, s2, h, gy,
               normalizer="tanh", basis_kind="rbf"):
    """VJP of the chain at x (y1 = stored intermediate). Returns
    (dx, dc1, dw1, dc2, dw2)."""
    _, u2, b2 = _layer_fwd(y1, c2, w2, g2, h, e2, normalizer, basis_kind)
    dy1, dc2, dw2 = _layer_bwd(y1, c2, w2, g2, h, u2, b2, gy, s2,
                               normalizer, basis_kind)
    _, u1, b1 = _layer_fwd(x, c1, w1, g1, h, e1, normalizer, basis_kind)
    dx, dc1, dw1 = _layer_bwd(x, c1, w1, g1, h, u1, b1, dy1, s1,
                              normalizer, basis_kind)
    return dx, dc1, dw1, dc2, dw2


def _layer_bwd_dx(x, c, w, gflat, h, u, basis, gy, collapse,
                  normalizer="tanh", basis_kind="rbf"):
    """dx-path of _layer_bwd only (the parameter GEMMs are deferred)."""
    m = jnp.dot(gy, c.T, preferred_element_type=jnp.float32,
                precision=_PREC[0])   # [K, I*G]
    dxn_rep = m * _basis_du(u, basis, basis_kind) * (1.0 / h)
    dxn = jnp.dot(dxn_rep, collapse,
                  preferred_element_type=jnp.float32,
                  precision=_PREC[0])           # [K, I]
    return dxn * _dnorm(x, normalizer) + jnp.dot(
        gy, w.T, preferred_element_type=jnp.float32,
        precision=_PREC[0]) * _dswish(x)


def _chain_vjp_collect(x, y1, c1, w1, c2, w2, g1, g2, e1, e2, s1, s2, h,
                       gy, normalizer="tanh", basis_kind="rbf"):
    """Chain VJP with DEFERRED parameter cotangents: returns
    (dx, (b1, swx, dy1, b2, swy1, gy)) so the caller can batch
      dc1 = b1^T dy1, dw1 = swx^T dy1, dc2 = b2^T gy, dw2 = swy1^T gy
    across stages and steps (one GEMM each per window)."""
    _, u2, b2 = _layer_fwd(y1, c2, w2, g2, h, e2, normalizer, basis_kind)
    dy1 = _layer_bwd_dx(y1, c2, w2, g2, h, u2, b2, gy, s2, normalizer,
                        basis_kind)
    _, u1, b1 = _layer_fwd(x, c1, w1, g1, h, e1, normalizer, basis_kind)
    dx = _layer_bwd_dx(x, c1, w1, g1, h, u1, b1, dy1, s1, normalizer,
                       basis_kind)
    return dx, (b1, _swish(x), dy1, b2, _swish(y1), gy)


def _dot_t0(a, b):
    """a^T @ b without materializing the transpose (contract dim 0)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PREC[0])


def _chain_param_gemms(ops):
    """(b1, swx, dy1, b2, swy1, gy) stacked over any number of
    stages/steps -> (dc1, dw1, dc2, dw2)."""
    b1, swx, dy1, b2, swy1, gy = ops
    return (_dot_t0(b1, dy1), _dot_t0(swx, dy1),
            _dot_t0(b2, gy), _dot_t0(swy1, gy))


def _bwd_window(n_steps: int, max_w: int = 8) -> int:
    """Largest divisor of n_steps <= max_w (static window length for the
    cross-step parameter-GEMM batching in the multistep backward)."""
    for w in range(min(max_w, n_steps), 0, -1):
        if n_steps % w == 0:
            return w
    return 1


def _step_fwd_kernel(spec, tab, dt, needed,
                     x_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                     g1_ref, g2_ref, e1_ref, e2_ref, y_ref):
    x = x_ref[:]
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    g1, g2, e1, e2 = g1_ref[:], g2_ref[:], e1_ref[:], e2_ref[:]
    ks = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        xi = x
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                xi = xi + (dt * tab.a[i][j]) * ks[j]
        ks[i], _ = _chain_f(xi, c1, w1, c2, w2, g1, g2, e1, e2, spec.h,
                            spec.normalizer, spec.basis)
    y = x
    for i in range(tab.stages):
        if tab.b[i] != 0.0:
            y = y + (dt * tab.b[i]) * ks[i]
    y_ref[:] = y


def _step_bwd_kernel(spec, tab, dt, needed,
                     x_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                     g1_ref, g2_ref, e1_ref, e2_ref, s1_ref, s2_ref,
                     gy_ref,
                     dx_ref, dc1_ref, dw1_ref, dc2_ref, dw2_ref):
    x = x_ref[:]
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    g1, g2, e1, e2 = g1_ref[:], g2_ref[:], e1_ref[:], e2_ref[:]
    s1, s2 = s1_ref[:], s2_ref[:]
    gy = gy_ref[:]

    # recompute forward stages, keeping stage inputs + chain intermediates
    ks = [None] * tab.stages
    xs = [None] * tab.stages
    y1s = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        xi = x
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                xi = xi + (dt * tab.a[i][j]) * ks[j]
        xs[i] = xi
        ks[i], y1s[i] = _chain_f(xi, c1, w1, c2, w2, g1, g2, e1, e2,
                                 spec.h, spec.normalizer, spec.basis)

    # reverse recursion
    xbar = gy
    kbar = [None] * tab.stages
    for i in range(tab.stages):
        if needed[i] and tab.b[i] != 0.0:
            kbar[i] = (dt * tab.b[i]) * gy
    dc1 = jnp.zeros_like(c1)
    dw1 = jnp.zeros_like(w1)
    dc2 = jnp.zeros_like(c2)
    dw2 = jnp.zeros_like(w2)
    for i in range(tab.stages - 1, -1, -1):
        if not needed[i] or kbar[i] is None:
            continue
        dxi, dc1i, dw1i, dc2i, dw2i = _chain_vjp(
            xs[i], y1s[i], c1, w1, c2, w2, g1, g2, e1, e2, s1, s2,
            spec.h, kbar[i], spec.normalizer, spec.basis)
        xbar = xbar + dxi
        dc1 = dc1 + dc1i
        dw1 = dw1 + dw1i
        dc2 = dc2 + dc2i
        dw2 = dw2 + dw2i
        for j in range(i):
            if tab.a[i][j] != 0.0 and needed[j]:
                contrib = (dt * tab.a[i][j]) * dxi
                kbar[j] = contrib if kbar[j] is None else kbar[j] + contrib

    dx_ref[:] = xbar
    dc1_ref[:] = dc1
    dw1_ref[:] = dw1
    dc2_ref[:] = dc2
    dw2_ref[:] = dw2


def _consts(spec: ChainSpec):
    return (jnp.asarray(spec.grid_flat(spec.in_dims)),
            jnp.asarray(spec.grid_flat(spec.hidden)),
            jnp.asarray(spec.expand(spec.in_dims)),
            jnp.asarray(spec.expand(spec.hidden)),
            jnp.asarray(spec.collapse(spec.in_dims)),
            jnp.asarray(spec.collapse(spec.hidden)))


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 8, 9))
def fused_rk_step(spec: ChainSpec, solver: str, dt: float,
                  x, c1, w1, c2, w2, interpret: bool | None = None,
                  bwd_precision: str = "highest"):
    """One whole RK step y = x + dt*sum(b_i k_i) as ONE Pallas kernel.

    x: [K, I] batch of states; solver: fixed-step tableau name; dt:
    static step size. Differentiable w.r.t. x and all params via the
    single-kernel discrete adjoint. bwd_precision: "highest" (exact-f32
    backward) | "bf16" (1-pass MXU dots in the backward kernel only).
    """
    check_bwd_precision(bwd_precision)
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    g1, g2, e1, e2, _, _ = _consts(spec)
    return pl.pallas_call(
        partial(_step_fwd_kernel, spec, tab, dt, needed),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=itp,
    )(x, c1, w1, c2, w2, g1, g2, e1, e2)


def _frs_fwd(spec, solver, dt, x, c1, w1, c2, w2, interpret,
             bwd_precision):
    y = fused_rk_step(spec, solver, dt, x, c1, w1, c2, w2, interpret,
                      bwd_precision)
    return y, (x, c1, w1, c2, w2)


def _frs_bwd(spec, solver, dt, interpret, bwd_precision, res, gy):
    x, c1, w1, c2, w2 = res
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    g1, g2, e1, e2, s1, s2 = _consts(spec)
    with _prec_ctx(_BWD_PRECS[bwd_precision]):
        dx, dc1, dw1, dc2, dw2 = pl.pallas_call(
            partial(_step_bwd_kernel, spec, tab, dt, needed),
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, jnp.float32),
                jax.ShapeDtypeStruct(c1.shape, jnp.float32),
                jax.ShapeDtypeStruct(w1.shape, jnp.float32),
                jax.ShapeDtypeStruct(c2.shape, jnp.float32),
                jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            ),
            interpret=itp,
        )(x, c1, w1, c2, w2, g1, g2, e1, e2, s1, s2, gy)
    return dx, dc1, dw1, dc2, dw2


fused_rk_step.defvjp(_frs_fwd, _frs_bwd)


def fused_odeint(spec: ChainSpec, solver: str, dt: float, n_steps: int,
                 x0, c1, w1, c2, w2, *, save_every: int = 1,
                 interpret: bool | None = None):
    """Fixed-grid solve as a scan of fused whole-step kernels.

    Returns [n_steps//save_every + 1, K, I] including x0.
    """
    def body(x, _):
        y = fused_rk_step(spec, solver, dt, x, c1, w1, c2, w2, interpret)
        return y, y

    _, ys = jax.lax.scan(body, x0, None, length=n_steps)
    ys = jnp.concatenate([x0[None], ys], axis=0)
    if save_every != 1:
        ys = ys[::save_every]
    return ys


# ---------------------------------------------------------------------------
# multi-step fused kernels: N whole RK steps per kernel launch
# ---------------------------------------------------------------------------

def _multistep_fwd_kernel(spec, tab, dt, needed, n_steps,
                          x_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                          g1_ref, g2_ref, e1_ref, e2_ref,
                          ys_ref):
    """Advance n_steps whole RK steps inside one kernel, writing every
    post-step state to ys_ref [n_steps, K, I] (consumed by the backward
    kernel and by trajectory losses)."""
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    g1, g2, e1, e2 = g1_ref[:], g2_ref[:], e1_ref[:], e2_ref[:]

    def one_step(x):
        ks = [None] * tab.stages
        for i in range(tab.stages):
            if not needed[i]:
                continue
            xi = x
            for j in range(i):
                if tab.a[i][j] != 0.0 and ks[j] is not None:
                    xi = xi + (dt * tab.a[i][j]) * ks[j]
            ks[i], _ = _chain_f(xi, c1, w1, c2, w2, g1, g2, e1, e2,
                                spec.h, spec.normalizer, spec.basis)
        y = x
        for i in range(tab.stages):
            if tab.b[i] != 0.0:
                y = y + (dt * tab.b[i]) * ks[i]
        return y

    def body(s, x):
        y = one_step(x)
        ys_ref[s] = y
        return y

    jax.lax.fori_loop(0, n_steps, body, x_ref[:], unroll=False)


def _multistep_bwd_kernel(spec, tab, dt, needed, n_steps, window,
                          x0_ref, ys_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                          g1_ref, g2_ref, e1_ref, e2_ref, s1_ref, s2_ref,
                          gys_ref,
                          dx_ref, dc1_ref, dw1_ref, dc2_ref, dw2_ref):
    """Reverse sweep over the stored states: for each step (backwards),
    rebuild the stages from the step's INPUT state and run the discrete
    adjoint, folding in the output cotangent gys[s] of every saved state.

    Steps run in unrolled windows of `window` (a divisor of n_steps):
    the dx-chain is sequential, but each window's parameter cotangents
    are batched into FOUR GEMMs total — the per-stage param GEMMs are
    tiny fixed-latency ops and dominate the sequential chain otherwise."""
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    g1, g2, e1, e2 = g1_ref[:], g2_ref[:], e1_ref[:], e2_ref[:]
    s1, s2 = s1_ref[:], s2_ref[:]

    def step_adjoint_collect(x, xbar):
        """One-step discrete adjoint (dx-chain); parameter-GEMM operands
        concatenated over the step's stages are returned for deferred
        batching. Returns (dx, ops)."""
        ks = [None] * tab.stages
        xs = [None] * tab.stages
        y1s = [None] * tab.stages
        for i in range(tab.stages):
            if not needed[i]:
                continue
            xi = x
            for j in range(i):
                if tab.a[i][j] != 0.0 and ks[j] is not None:
                    xi = xi + (dt * tab.a[i][j]) * ks[j]
            xs[i] = xi
            ks[i], y1s[i] = _chain_f(xi, c1, w1, c2, w2, g1, g2, e1, e2,
                                     spec.h, spec.normalizer, spec.basis)
        dx = xbar
        kbar = [None] * tab.stages
        for i in range(tab.stages):
            if needed[i] and tab.b[i] != 0.0:
                kbar[i] = (dt * tab.b[i]) * xbar
        per_stage = []
        for i in range(tab.stages - 1, -1, -1):
            if not needed[i] or kbar[i] is None:
                continue
            dxi, ops = _chain_vjp_collect(
                xs[i], y1s[i], c1, w1, c2, w2, g1, g2, e1, e2, s1, s2,
                spec.h, kbar[i], spec.normalizer, spec.basis)
            per_stage.append(ops)
            dx = dx + dxi
            for j in range(i):
                if tab.a[i][j] != 0.0 and needed[j]:
                    contrib = (dt * tab.a[i][j]) * dxi
                    kbar[j] = contrib if kbar[j] is None \
                        else kbar[j] + contrib
        ops = tuple(jnp.concatenate([o[i] for o in per_stage], axis=0)
                    for i in range(6))
        return dx, ops

    def body(wi, carry):
        xbar, dc1, dw1, dc2, dw2 = carry
        ops_all = []
        for u in range(window):
            s = n_steps - 1 - (wi * window + u)
            # input state of step s: ys[s-1] (or x0 for the first step)
            x_in = jnp.where(s == 0, x0_ref[:],
                             ys_ref[jnp.maximum(s - 1, 0)])
            xbar = xbar + gys_ref[s]
            xbar, ops = step_adjoint_collect(x_in, xbar)
            ops_all.append(ops)
        stacked = tuple(jnp.concatenate([o[i] for o in ops_all], axis=0)
                        for i in range(6))
        dc1i, dw1i, dc2i, dw2i = _chain_param_gemms(stacked)
        return (xbar, dc1 + dc1i, dw1 + dw1i, dc2 + dc2i, dw2 + dw2i)

    init = (jnp.zeros_like(x0_ref[:]), jnp.zeros_like(c1),
            jnp.zeros_like(w1), jnp.zeros_like(c2), jnp.zeros_like(w2))
    dx, dc1, dw1, dc2, dw2 = jax.lax.fori_loop(0, n_steps // window, body,
                                               init, unroll=False)
    dx_ref[:] = dx
    dc1_ref[:] = dc1
    dw1_ref[:] = dw1
    dc2_ref[:] = dc2
    dw2_ref[:] = dw2


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 9, 10))
def fused_rk_multistep(spec: ChainSpec, solver: str, dt: float,
                       n_steps: int, x0, c1, w1, c2, w2,
                       interpret: bool | None = None,
                       bwd_precision: str = "highest"):
    """n_steps whole RK steps in ONE kernel launch; returns the full
    post-step state history ys [n_steps, K, I] (x0 NOT included).

    The backward pass is a second single kernel that sweeps the stored
    states in reverse, accepting cotangents for EVERY saved state — so a
    trajectory loss over all save points costs exactly two launches."""
    check_bwd_precision(bwd_precision)
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    g1, g2, e1, e2, _, _ = _consts(spec)
    return pl.pallas_call(
        partial(_multistep_fwd_kernel, spec, tab, dt, needed, n_steps),
        out_shape=jax.ShapeDtypeStruct((n_steps,) + x0.shape, jnp.float32),
        interpret=itp,
    )(x0, c1, w1, c2, w2, g1, g2, e1, e2)


def _frm_fwd(spec, solver, dt, n_steps, x0, c1, w1, c2, w2, interpret,
             bwd_precision):
    ys = fused_rk_multistep(spec, solver, dt, n_steps, x0, c1, w1, c2, w2,
                            interpret, bwd_precision)
    return ys, (x0, ys, c1, w1, c2, w2)


def _frm_bwd(spec, solver, dt, n_steps, interpret, bwd_precision, res,
             gys):
    x0, ys, c1, w1, c2, w2 = res
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    g1, g2, e1, e2, s1, s2 = _consts(spec)
    with _prec_ctx(_BWD_PRECS[bwd_precision]):
        dx, dc1, dw1, dc2, dw2 = pl.pallas_call(
            partial(_multistep_bwd_kernel, spec, tab, dt, needed, n_steps,
                    _bwd_window(n_steps)),
            out_shape=(
                jax.ShapeDtypeStruct(x0.shape, jnp.float32),
                jax.ShapeDtypeStruct(c1.shape, jnp.float32),
                jax.ShapeDtypeStruct(w1.shape, jnp.float32),
                jax.ShapeDtypeStruct(c2.shape, jnp.float32),
                jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            ),
            interpret=itp,
        )(x0, ys, c1, w1, c2, w2, g1, g2, e1, e2, s1, s2, gys)
    return dx, dc1, dw1, dc2, dw2


fused_rk_multistep.defvjp(_frm_fwd, _frm_bwd)
