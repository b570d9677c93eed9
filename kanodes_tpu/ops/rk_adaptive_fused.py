"""Whole-ADAPTIVE-solve fused Pallas kernels for KAN-chain neural ODEs.

The reference-faithful LV mode integrates with an adaptive embedded RK
pair (Tsit5 + step controller, `LV_driver_KANODE.jl:180-184`) and
differentiates straight through the adaptive loop (Zygote
discretize-then-optimize, :284). The XLA rebuild of that loop
(`ode/integrate.py` adjoint="direct") is dispatch-bound on TPU: every
controller iteration costs several fusion-group launches, and the
bounded scan pays them `max_steps` times per solve (~361 it/s at the
full LV budget).

This module folds the ENTIRE bounded controller loop into one forward
kernel launch and the entire discrete adjoint into one backward launch:

  forward:  fori_loop over max_steps; each live iteration runs all
            stages of the (FSAL) tableau over the fused 2-layer KDense
            chain, the Hairer error norm, the I/PI controller, and the
            save-point clipping of `ode/integrate._adaptive_step`
            (dense=False). Finished iterations skip the stage math via
            lax.cond — the bounded loop costs only the steps actually
            taken. Accepted steps record (x_in, k1_in, dt_signed,
            save_hit) into VMEM side outputs.
  backward: replays the recorded accepted steps in reverse. This is
            EXACTLY the "direct" adjoint's parameter/initial-state
            gradient: the controller's step-size chain has no parameter
            dependence (the error norm is stop-gradient'ed upstream,
            `integrate.py:_adaptive_step/_init_state`), so accepted
            step sizes are constants of the VJP, and rejected steps are
            gradient-transparent (their y1 is discarded, err is
            stopped). Gradients flow through the y-chain and the FSAL
            k1-chain only — both replayed here. Per-step parameter
            cotangents are batched into four GEMMs (the
            `rk_fused._multistep_bwd_kernel` trick, per step).

Cotangent coverage: x0 and all chain params. The save-time vector `ts`
gets a hard-zero cotangent (the XLA "direct" path differentiates the
save-clipping chain; no experiment trains through ts — use
`ode/integrate.odeint` when ts-gradients matter).

Replaces: the reference's Zygote-through-Tsit5 training path as TWO
kernel launches per training iteration instead of ~max_steps dispatch
rounds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kanodes_tpu.ode.integrate import StepController
from kanodes_tpu.ode.tableaus import Tableau, get_tableau
from kanodes_tpu.ops.kdense_pallas import (ChainSpec, _interpret_default,
                                           _layer_fwd,
                                           _BWD_PRECS, _prec_ctx,
                                           check_bwd_precision)
from kanodes_tpu.ops.rk_fused import (_chain_f, _chain_vjp_collect,
                                      _chain_param_gemms, _consts)

Array = jax.Array


def _hairer_norm(diff, y0, y1, rtol, atol):
    """Mixed-tolerance RMS norm (integrate.error_norm, single-leaf)."""
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    r = diff / scale
    return jnp.sqrt(jnp.sum(r * r) / diff.size)


def _ctrl_factor(ctrl: StepController, err_nrm, order: int, err_prev):
    """StepController.factor with pow spelled as exp/log for Mosaic."""
    e = jnp.maximum(err_nrm, 1e-12)
    fac = ctrl.safety * jnp.exp(
        (-(ctrl.icoeff + ctrl.pcoeff) / order) * jnp.log(e))
    if ctrl.pcoeff != 0.0:
        ep = jnp.maximum(err_prev, 1e-12)
        fac = fac * jnp.exp((ctrl.pcoeff / order) * jnp.log(ep))
    return jnp.clip(fac, ctrl.min_factor, ctrl.max_factor)


def _stage_sweep(tab: Tableau, chain, x, dts, k1):
    """All stages from step-input x with signed step dts and FSAL k1.

    Returns (ks, xs, y1s, y1): per-stage RHS values, stage inputs, and
    chain intermediates (xs[0]/y1s[0] are None — stage 1 is the carried
    FSAL value, not a chain eval)."""
    s = tab.stages
    ks = [k1] + [None] * (s - 1)
    xs = [None] * s
    y1s = [None] * s
    for i in range(1, s):
        xi = x
        for j in range(i):
            if tab.a[i][j] != 0.0:
                xi = xi + (dts * tab.a[i][j]) * ks[j]
        xs[i] = xi
        ks[i], y1s[i] = chain(xi)
    y1 = x
    for i in range(s):
        if tab.b[i] != 0.0:
            y1 = y1 + (dts * tab.b[i]) * ks[i]
    return ks, xs, y1s, y1


def _initial_dt_inkernel(chain_y, x0, f0, t0, tdir, order, rtol, atol):
    """integrate.initial_dt, single-leaf form (same heuristic, in-kernel;
    its value is a gradient constant — matches the stop_gradient in
    `integrate._init_state`)."""
    def nrm(v):
        sc = atol + rtol * jnp.abs(x0)
        r = v / sc
        return jnp.sqrt(jnp.sum(r * r) / v.size)

    d0, d1 = nrm(x0), nrm(f0)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = x0 + (tdir * h0) * f0
    f1 = chain_y(y1)
    d2 = nrm(f1 - f0) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        jnp.exp((1.0 / (order + 1)) * jnp.log(0.01 / dmax)))
    return jnp.minimum(100.0 * h0, h1)


def _adaptive_fwd_kernel(spec, tab, rtol, atol, ctrl, max_steps, dt0,
                         x0_ref, ts_ref,
                         c1_ref, w1_ref, c2_ref, w2_ref,
                         g1_ref, g2_ref, e1_ref, e2_ref,
                         ys_ref, rx_ref, rk1_ref, rdt_ref, rsx_ref,
                         stats_ref):
    x0 = x0_ref[:]
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    g1, g2, e1, e2 = g1_ref[:], g2_ref[:], e1_ref[:], e2_ref[:]
    T = ts_ref.shape[0]

    def chain(x):
        return _chain_f(x, c1, w1, c2, w2, g1, g2, e1, e2, spec.h,
                        spec.normalizer, spec.basis)

    def chain_y(x):
        return chain(x)[0]

    t0 = ts_ref[0, 0]
    tdir = jnp.where(ts_ref[T - 1, 0] >= t0, 1.0, -1.0)
    k1_0 = chain_y(x0)
    if dt0 is None:
        dt = _initial_dt_inkernel(chain_y, x0, k1_0, t0, tdir, tab.order,
                                  rtol, atol)
    else:
        dt = jnp.float32(dt0)

    ys_ref[0] = x0

    def skip(c):
        return c

    def active(c):
        (t, y, dt, k1, sidx, done, err_prev,
         n_acc, n_rej, n_it) = c
        t_save = ts_ref[sidx, 0]
        remaining = (t_save - t) * tdir
        hit = dt >= remaining
        dt_used = jnp.where(hit, remaining, dt)
        dts = tdir * dt_used

        ks, _, _, y1 = _stage_sweep(tab, chain, y, dts, k1)
        err = None
        for i in range(tab.stages):
            if tab.b_err[i] != 0.0:
                term = (dts * tab.b_err[i]) * ks[i]
                err = term if err is None else err + term
        err_nrm = _hairer_norm(err, y, y1, rtol, atol)
        accept = (err_nrm <= 1.0) | (dt_used <= ctrl.dt_min)
        fac = _ctrl_factor(ctrl, err_nrm, tab.order, err_prev)
        dt_next = jnp.maximum(dt_used * fac, ctrl.dt_min)

        t1_ = t + dts
        t_new = jnp.where(accept, jnp.where(hit, t_save, t1_), t)
        y_new = jnp.where(accept, y1, y)
        k_last = ks[-1]
        k1_new = jnp.where(accept, k_last, k1)
        saved = accept & hit

        @pl.when(saved)
        def _():
            ys_ref[sidx] = y1

        @pl.when(accept)
        def _():
            rx_ref[n_acc] = y
            rk1_ref[n_acc] = k1
            rdt_ref[n_acc, 0] = dts
            rsx_ref[n_acc, 0] = jnp.where(saved, sidx, -1)

        sidx_new = sidx + saved.astype(jnp.int32)
        done_new = sidx_new >= T
        return (t_new, y_new, dt_next, k1_new, sidx_new, done_new,
                jnp.where(accept, jnp.maximum(err_nrm, 1e-12), err_prev),
                n_acc + accept.astype(jnp.int32),
                n_rej + (~accept).astype(jnp.int32),
                n_it + 1)

    def body(_, c):
        return lax.cond(c[5], skip, active, c)

    init = (t0, x0, dt, k1_0,
            jnp.int32(1), jnp.asarray(T <= 1),
            jnp.float32(1.0),
            jnp.int32(0), jnp.int32(0), jnp.int32(0))
    (t, y, dt, k1, sidx, done, err_prev,
     n_acc, n_rej, n_it) = lax.fori_loop(0, max_steps, body, init,
                                         unroll=False)

    # unreached-save fill: rows past save_idx get the final integrated
    # state (integrate._fill_unreached semantics)
    def fill(i, _):
        @pl.when(i >= sidx)
        def _():
            ys_ref[i] = y
        return 0

    lax.fori_loop(1, T, fill, 0, unroll=False)

    stats_ref[0, 0] = n_acc
    stats_ref[1, 0] = n_rej
    stats_ref[2, 0] = n_it
    stats_ref[3, 0] = sidx


def _adaptive_bwd_kernel(spec, tab, max_steps,
                         x0_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                         g1_ref, g2_ref, e1_ref, e2_ref, s1_ref, s2_ref,
                         rx_ref, rk1_ref, rdt_ref, rsx_ref, stats_ref,
                         gys_ref,
                         dx0_ref, dc1_ref, dw1_ref, dc2_ref, dw2_ref):
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    g1, g2, e1, e2 = g1_ref[:], g2_ref[:], e1_ref[:], e2_ref[:]
    s1, s2 = s1_ref[:], s2_ref[:]
    n_acc = stats_ref[0, 0]
    sidx_final = stats_ref[3, 0]
    T = gys_ref.shape[0]
    x0 = x0_ref[:]

    def chain(x):
        return _chain_f(x, c1, w1, c2, w2, g1, g2, e1, e2, spec.h,
                        spec.normalizer, spec.basis)

    def vjp_collect(x, y1_int, gy):
        return _chain_vjp_collect(x, y1_int, c1, w1, c2, w2, g1, g2,
                                  e1, e2, s1, s2, spec.h, gy,
                                  spec.normalizer, spec.basis)

    # cotangent of the final integrated state from the unreached fill
    def fill_acc(i, acc):
        return acc + jnp.where(i >= sidx_final, gys_ref[i],
                               jnp.zeros_like(acc))

    xbar0 = lax.fori_loop(1, T, fill_acc, jnp.zeros_like(x0),
                          unroll=False)

    zero_p = (jnp.zeros_like(c1), jnp.zeros_like(w1),
              jnp.zeros_like(c2), jnp.zeros_like(w2))

    def skip(c):
        return c

    def active(c):
        wi, xbar, k1bar, dc1, dw1, dc2, dw2 = c
        s = n_acc - 1 - wi
        x_in = rx_ref[s]
        k1_in = rk1_ref[s]
        dts = rdt_ref[s, 0]
        sx = rsx_ref[s, 0]
        g_saved = gys_ref[jnp.maximum(sx, 0)]
        xbar = xbar + jnp.where(sx >= 0, g_saved, jnp.zeros_like(g_saved))

        ks, xs, y1s, _ = _stage_sweep(tab, chain, x_in, dts, k1_in)
        kbar = [None] * tab.stages
        for i in range(tab.stages):
            if tab.b[i] != 0.0:
                kbar[i] = (dts * tab.b[i]) * xbar
        # FSAL carry-out: the next step's k1 was this step's last stage
        kbar[-1] = k1bar if kbar[-1] is None else kbar[-1] + k1bar

        xbar_new = xbar
        per_stage = []
        for i in range(tab.stages - 1, 0, -1):
            if kbar[i] is None:
                continue
            dxi, ops = vjp_collect(xs[i], y1s[i], kbar[i])
            per_stage.append(ops)
            xbar_new = xbar_new + dxi
            for j in range(i):
                if tab.a[i][j] != 0.0:
                    contrib = (dts * tab.a[i][j]) * dxi
                    kbar[j] = contrib if kbar[j] is None \
                        else kbar[j] + contrib
        # stage 1 is the carried FSAL value, not a chain eval: its
        # cotangent becomes the k1bar handed to the previous step
        k1bar_new = kbar[0] if kbar[0] is not None \
            else jnp.zeros_like(k1bar)
        stacked = tuple(jnp.concatenate([o[i] for o in per_stage], axis=0)
                        for i in range(6))
        dc1i, dw1i, dc2i, dw2i = _chain_param_gemms(stacked)
        return (wi, xbar_new, k1bar_new,
                dc1 + dc1i, dw1 + dw1i, dc2 + dc2i, dw2 + dw2i)

    def body(wi, c):
        _, xbar, k1bar, dc1, dw1, dc2, dw2 = c
        return lax.cond(n_acc - 1 - wi >= 0, active, skip,
                        (wi, xbar, k1bar, dc1, dw1, dc2, dw2))

    init = (jnp.int32(0), xbar0, jnp.zeros_like(x0)) + zero_p
    (_, xbar, k1bar, dc1, dw1, dc2, dw2) = lax.fori_loop(
        0, max_steps, body, init, unroll=False)

    # the very first k1 was f(t0, x0) — one chain eval of the inputs
    _, y1_int = chain(x0)
    dx_k1, ops0 = vjp_collect(x0, y1_int, k1bar)
    dc1i, dw1i, dc2i, dw2i = _chain_param_gemms(ops0)

    dx0_ref[:] = xbar + dx_k1 + gys_ref[0]
    dc1_ref[:] = dc1 + dc1i
    dw1_ref[:] = dw1 + dw1i
    dc2_ref[:] = dc2 + dc2i
    dw2_ref[:] = dw2 + dw2i


def _validate(tab: Tableau):
    if tab.b_err is None or not tab.fsal:
        raise ValueError("fused adaptive path requires an FSAL tableau "
                         "with an embedded error estimate (tsit5/dopri5/"
                         "bs3)")


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _smem():
    # scalar records/reads (per-step dt, save indices, counters) must
    # live in SMEM — Mosaic cannot store scalars to VMEM
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd_call(spec, tab, rtol, atol, max_steps, ctrl, dt0, interpret,
              x0, ts, c1, w1, c2, w2):
    g1, g2, e1, e2, _, _ = _consts(spec)
    T = ts.shape[0]
    K, I = x0.shape
    return pl.pallas_call(
        partial(_adaptive_fwd_kernel, spec, tab, rtol, atol, ctrl,
                max_steps, dt0),
        out_shape=(
            jax.ShapeDtypeStruct((T, K, I), jnp.float32),           # ys
            jax.ShapeDtypeStruct((max_steps, K, I), jnp.float32),   # rx
            jax.ShapeDtypeStruct((max_steps, K, I), jnp.float32),   # rk1
            jax.ShapeDtypeStruct((max_steps, 1), jnp.float32),      # rdt
            jax.ShapeDtypeStruct((max_steps, 1), jnp.int32),        # rsx
            jax.ShapeDtypeStruct((4, 1), jnp.int32),                # stats
        ),
        in_specs=[_vmem(), _smem()] + [_vmem()] * 8,
        out_specs=(_vmem(), _vmem(), _vmem(), _smem(), _smem(),
                   _smem()),
        interpret=interpret,
    )(x0, ts.reshape(T, 1).astype(jnp.float32), c1, w1, c2, w2,
      g1, g2, e1, e2)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 13, 14))
def fused_adaptive_odeint(spec: ChainSpec, solver: str, rtol: float,
                          atol: float, max_steps: int,
                          ctrl: StepController, dt0: float | None,
                          x0, ts, c1, w1, c2, w2,
                          interpret: bool | None = None,
                          bwd_precision: str = "highest"):
    """Whole bounded-adaptive solve as ONE kernel (+ ONE for backward).

    x0: [K, I] batch of initial states; ts: [T] save times (clipped-step
    controller — accepted steps land exactly on save times). Returns
    ys [T, K, I] including the x0 row, with unreached rows (max_steps
    exhausted) filled with the final state, matching
    `ode/integrate.odeint(adjoint="direct")`.

    Differentiable w.r.t. x0 and the chain params with gradients equal
    to the "direct" adjoint's (see module docstring); `ts` cotangent is
    hard zero. dt0=None uses the in-kernel Hairer initial-step
    heuristic (a gradient constant either way).
    """
    check_bwd_precision(bwd_precision)
    tab = get_tableau(solver)
    _validate(tab)
    itp = _interpret_default() if interpret is None else interpret
    ys, *_ = _fwd_call(spec, tab, rtol, atol, max_steps, ctrl, dt0, itp,
                       x0, ts, c1, w1, c2, w2)
    return ys


def _fao_fwd(spec, solver, rtol, atol, max_steps, ctrl, dt0,
             x0, ts, c1, w1, c2, w2, interpret, bwd_precision):
    tab = get_tableau(solver)
    _validate(tab)
    itp = _interpret_default() if interpret is None else interpret
    ys, rx, rk1, rdt, rsx, stats = _fwd_call(
        spec, tab, rtol, atol, max_steps, ctrl, dt0, itp,
        x0, ts, c1, w1, c2, w2)
    return ys, (x0, ts, c1, w1, c2, w2, rx, rk1, rdt, rsx, stats)


def _fao_bwd(spec, solver, rtol, atol, max_steps, ctrl, dt0,
             interpret, bwd_precision, res, gys):
    x0, ts, c1, w1, c2, w2, rx, rk1, rdt, rsx, stats = res
    tab = get_tableau(solver)
    itp = _interpret_default() if interpret is None else interpret
    g1, g2, e1, e2, s1, s2 = _consts(spec)
    with _prec_ctx(_BWD_PRECS[bwd_precision]):
        dx0, dc1, dw1, dc2, dw2 = pl.pallas_call(
            partial(_adaptive_bwd_kernel, spec, tab, max_steps),
            out_shape=(
                jax.ShapeDtypeStruct(x0.shape, jnp.float32),
                jax.ShapeDtypeStruct(c1.shape, jnp.float32),
                jax.ShapeDtypeStruct(w1.shape, jnp.float32),
                jax.ShapeDtypeStruct(c2.shape, jnp.float32),
                jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            ),
            in_specs=[_vmem()] * 13 + [_smem(), _smem(), _smem(),
                                       _vmem()],
            interpret=itp,
        )(x0, c1, w1, c2, w2, g1, g2, e1, e2, s1, s2,
          rx, rk1, rdt, rsx, stats, gys)
    return dx0, jnp.zeros_like(ts), dc1, dw1, dc2, dw2


fused_adaptive_odeint.defvjp(_fao_fwd, _fao_bwd)


def fused_adaptive_stats(spec: ChainSpec, solver: str, rtol: float,
                         atol: float, max_steps: int,
                         ctrl: StepController, dt0: float | None,
                         x0, ts, c1, w1, c2, w2,
                         interpret: bool | None = None):
    """Run the forward kernel only; returns (ys, SolveStats-like dict)
    with n_accept/n_reject/n_iter/success — the `return_stats` parity
    hook (not differentiable)."""
    tab = get_tableau(solver)
    _validate(tab)
    itp = _interpret_default() if interpret is None else interpret
    ys, _, _, _, _, stats = _fwd_call(spec, tab, rtol, atol, max_steps,
                                      ctrl, dt0, itp, x0, ts, c1, w1,
                                      c2, w2)
    return ys, {"n_accept": stats[0, 0], "n_reject": stats[1, 0],
                "n_iter": stats[2, 0],
                "success": stats[3, 0] >= ts.shape[0]}
