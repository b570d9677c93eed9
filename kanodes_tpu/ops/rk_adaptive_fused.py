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


# ---------------------------------------------------------------------------
# per-member controllers: the packed-ensemble upgrade of the kernel above
# ---------------------------------------------------------------------------
#
# `ode.odeint_members` gives every packed member its own save-clipped
# step controller on the XLA bounded-scan path; these kernels are its
# fused analogue — the whole per-member controller loop as ONE forward
# launch and one backward launch. Controller state (t, dt, save_idx,
# err_prev, done, counters) is vectorized [1, S]; per-member scalars
# cross into control flow only via masked full reductions (the Mosaic
#-safe vector->scalar path), and the member axis expands/collapses to
# the packed state axis via constant 0/1 GEMMs built from iota (never
# a minor-dim reshape — CLAUDE.md numerics rules). Semantics mirror
# `odeint_members` exactly: save-time clamp at T-1, dt frozen at the
# PRE-update done mask, per-member Hairer norms over (batch, d).


def _member_mats(S: int, I: int):
    """EXP [S, I] and EXPT [I, S]: 0/1 member-block indicator GEMM
    operands, generated from iota inside the kernel (no reshape, no
    host constants)."""
    d = I // S
    row_e = lax.broadcasted_iota(jnp.int32, (S, I), 0)
    col_e = lax.broadcasted_iota(jnp.int32, (S, I), 1)
    exp = ((col_e >= row_e * d) & (col_e < (row_e + 1) * d)
           ).astype(jnp.float32)
    row_t = lax.broadcasted_iota(jnp.int32, (I, S), 0)
    col_t = lax.broadcasted_iota(jnp.int32, (I, S), 1)
    expt = ((row_t >= col_t * d) & (row_t < (col_t + 1) * d)
            ).astype(jnp.float32)
    return exp, expt


def _mdot(a, b):
    from kanodes_tpu.ops.rk_fused import _PREC
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_PREC[0])


def _member_blocksum(rr, lane_i, lane_f, S, I, d, bk):
    """Per-member block sums of rr [K, I] as a [1, S] vector, via S
    masked full reductions + one-hot rebuild. NOT a collapse GEMM:
    Mosaic fails with 'Not implemented: Sublane broadcast' when a
    [K,I]@[I,S] collapse consumes loop-carried operands inside a
    lax.cond region (bisected on v5e — the same GEMM on loop-invariant
    operands compiles fine), while masked reduce + scalar*one-hot is
    the proven-lowering pattern. S is small; the reduces are noise
    next to the stage GEMMs."""
    sums = lane_f * 0.0
    for s in range(S):
        cmf = bk(_colmask(s, I, d).astype(jnp.float32))
        oh_s = (lane_i == s).astype(jnp.float32)
        sums = sums + jnp.sum(rr * cmf) * oh_s
    return sums


def _member_norm_inkernel(err, y0, y1, rtol, atol, lane_i, lane_f,
                          S, I, d, bk):
    """Per-member Hairer norm [1, S] (integrate._member_norm: RMS over
    the member's (batch, d) block)."""
    K = y0.shape[0]
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    r = err / scale
    sums = _member_blocksum(r * r, lane_i, lane_f, S, I, d, bk)
    return jnp.sqrt(sums / (K * d))


def _lane_scalar(vec, s: int):
    """Extract lane s of a [1, S] vector as a scalar via a masked full
    reduction (Mosaic-safe: no sub-tile slicing). Reduces in f32 —
    Mosaic rejects some i32 vector relayouts ("non-singleton logical
    dimension is replicated"); the values here (save indices, counters)
    are exact in f32."""
    lane = lax.broadcasted_iota(jnp.int32, vec.shape, 1)
    v = vec.astype(jnp.float32)
    out = jnp.sum(jnp.where(lane == s, v, jnp.zeros_like(v)))
    return out.astype(vec.dtype)


def _colmask(s: int, I: int, d: int):
    """Member s's [1, I] column mask (bool), broadcastable over [K, I]."""
    lane = lax.broadcasted_iota(jnp.int32, (1, I), 1)
    return (lane >= s * d) & (lane < (s + 1) * d)


def _initial_dt_members_inkernel(chain_y, x0, f0, tdir, order, rtol,
                                 atol, exp, lane_i, lane_f, S, d, bk):
    """integrate._initial_dt_members, vectorized [1, S] in-kernel."""
    K, I = x0.shape

    def nrm(v):
        sc = atol + rtol * jnp.abs(x0)
        r = v / sc
        return jnp.sqrt(_member_blocksum(r * r, lane_i, lane_f,
                                         S, I, d, bk) / (K * d))

    d0, d1 = nrm(x0), nrm(f0)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = x0 + bk(_mdot(tdir * h0, exp)) * f0
    f1 = chain_y(y1)
    d2 = nrm(f1 - f0) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        jnp.exp((1.0 / (order + 1)) * jnp.log(0.01 / dmax)))
    return jnp.minimum(100.0 * h0, h1)


def _adaptive_members_fwd_kernel(spec, tab, rtol, atol, ctrl, max_steps,
                                 dt0, S,
                                 x0_ref, ts_ref,
                                 c1_ref, w1_ref, c2_ref, w2_ref,
                                 g1_ref, g2_ref, e1_ref, e2_ref,
                                 ys_ref, rx_ref, rk1_ref, rdt_ref,
                                 racc_ref, rsx_ref, mstats_ref, nit_ref):
    x0 = x0_ref[:]
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    g1, g2, e1, e2 = g1_ref[:], g2_ref[:], e1_ref[:], e2_ref[:]
    T = ts_ref.shape[0]
    K, I = x0.shape
    d = I // S
    exp, expt = _member_mats(S, I)
    t0 = ts_ref[0, 0]
    tdir = jnp.where(ts_ref[T - 1, 0] >= t0, 1.0, -1.0)

    def chain(x):
        return _chain_f(x, c1, w1, c2, w2, g1, g2, e1, e2, spec.h,
                        spec.normalizer, spec.basis)

    def chain_y(x):
        return chain(x)[0]

    # ALL per-member vector state is f32 (exact for these integer-valued
    # quantities: save indices and counters stay far below 2^24), and
    # every init is anchored on an iota so its layout is NATIVE, never
    # replicated — Mosaic cannot relayout native->replicated i32 at the
    # fori_loop/cond carry joins ("Invalid relayout: non-singleton
    # logical dimension is replicated in destination but not in
    # source", observed on v5e with i32 [1,S] constant carries).
    lane_i = lax.broadcasted_iota(jnp.int32, (1, S), 1)
    lane_f = lane_i.astype(jnp.float32)
    vec_f = lambda v: lane_f * 0.0 + v
    # Mosaic has no sublane broadcast: [1,N] vectors meeting [K,N]
    # arrays must be expanded through a ones-column GEMM when K > 1
    # (free on the MXU; identity at the LV drivers' K == 1)
    ones_k = jnp.zeros((K, 1), jnp.float32) + 1.0
    bk = (lambda v: v) if K == 1 else (lambda v: _mdot(ones_k, v))

    k1_0 = chain_y(x0)
    if dt0 is None:
        dt = _initial_dt_members_inkernel(chain_y, x0, k1_0, tdir,
                                          tab.order, rtol, atol,
                                          exp, lane_i, lane_f, S, d, bk)
    else:
        dt = vec_f(jnp.float32(dt0))

    ys_ref[0] = x0

    def skip(c):
        return c

    def active(c):
        (t, y, dt, k1, sidx, done, err_prev,
         n_acc, n_rej, n_itv, n_it) = c
        not_done = done < 0.5                              # [1, S] bool
        sidx_c = jnp.minimum(sidx, T - 1.0)                # [1, S] f32
        # per-member save time via SMEM scalar gathers (a [1,S]->[T,S]
        # one-hot broadcast is an unimplemented sublane broadcast)
        t_save = lane_f * 0.0
        for s in range(S):
            row_s = _lane_scalar(sidx_c, s).astype(jnp.int32)
            oh_s = (lane_i == s).astype(jnp.float32)       # [1, S]
            t_save = t_save + ts_ref[row_s, 0] * oh_s
        remaining = (t_save - t) * tdir
        hit = dt >= remaining
        dt_used = jnp.where(hit, remaining, dt)            # [1, S]
        dts = tdir * dt_used
        dts_e = bk(_mdot(dts, exp))                        # [K, I]

        ks, _, _, y1 = _stage_sweep(tab, chain, y, dts_e, k1)
        err = None
        for i in range(tab.stages):
            if tab.b_err[i] != 0.0:
                term = (dts_e * tab.b_err[i]) * ks[i]
                err = term if err is None else err + term
        err_nrm = _member_norm_inkernel(err, y, y1, rtol, atol,
                                        lane_i, lane_f, S, I, d,
                                        bk)                # [1, S]
        accept = (err_nrm <= 1.0) | (dt_used <= ctrl.dt_min)
        fac = _ctrl_factor(ctrl, err_nrm, tab.order, err_prev)
        dt_next = jnp.maximum(dt_used * fac, ctrl.dt_min)

        step_ok = accept & not_done                        # [1, S]
        ok_f = step_ok.astype(jnp.float32)
        t1_ = t + dts
        t_new = jnp.where(step_ok, jnp.where(hit, t_save, t1_), t)
        ok_e = bk(_mdot(ok_f, exp)) > 0.5                  # [K, I]
        y_new = jnp.where(ok_e, y1, y)
        k1_new = jnp.where(ok_e, ks[-1], k1)
        saved = step_ok & hit
        saved_f = saved.astype(jnp.float32)

        rx_ref[n_it] = y
        rk1_ref[n_it] = k1
        rdt_ref[n_it] = dts
        racc_ref[n_it] = ok_f
        rsx_ref[n_it] = jnp.where(saved, sidx_c, -1.0)

        for s in range(S):
            saved_s = _lane_scalar(saved_f, s) > 0.5
            row_s = _lane_scalar(jnp.where(saved, sidx_c, 0.0),
                                 s).astype(jnp.int32)
            cm = _colmask(s, I, d)

            @pl.when(saved_s)
            def _(row_s=row_s, cm=cm):
                ys_ref[row_s] = jnp.where(cm, y1, ys_ref[row_s])

        sidx_new = sidx + saved_f
        return (t_new, y_new,
                jnp.where(done > 0.5, dt, dt_next),        # freeze done
                k1_new, sidx_new,
                jnp.maximum(done, (sidx_new > T - 0.5
                                   ).astype(jnp.float32)),
                jnp.where(step_ok, jnp.maximum(err_nrm, 1e-12),
                          err_prev),
                n_acc + ok_f,
                n_rej + ((~accept).astype(jnp.float32)
                         * not_done.astype(jnp.float32)),
                n_itv + not_done.astype(jnp.float32),
                n_it + 1)

    def body(_, c):
        return lax.cond(jnp.min(c[5]) > 0.5, skip, active, c)

    init = (vec_f(t0), x0, dt, k1_0,
            vec_f(1.0), vec_f(1.0 if T <= 1 else 0.0), vec_f(1.0),
            vec_f(0.0), vec_f(0.0), vec_f(0.0), jnp.int32(0))
    (t, y, dt, k1, sidx, done, err_prev,
     n_acc, n_rej, n_itv, n_it) = lax.fori_loop(0, max_steps, body, init,
                                                unroll=False)

    # unreached-save fill per member (integrate.odeint_members tail)
    def fill(i, _):
        m_e = bk(_mdot((sidx <= i).astype(jnp.float32), exp)) > 0.5
        ys_ref[i] = jnp.where(m_e, y, ys_ref[i])
        return 0

    lax.fori_loop(1, T, fill, 0, unroll=False)

    mstats_ref[0] = n_acc
    mstats_ref[1] = n_rej
    mstats_ref[2] = n_itv
    mstats_ref[3] = sidx
    nit_ref[0, 0] = n_it


def _adaptive_members_bwd_kernel(spec, tab, max_steps, S,
                                 x0_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                                 g1_ref, g2_ref, e1_ref, e2_ref,
                                 s1_ref, s2_ref,
                                 rx_ref, rk1_ref, rdt_ref, racc_ref,
                                 rsx_ref, mstats_ref, nit_ref, gys_ref,
                                 dx0_ref, dc1_ref, dw1_ref, dc2_ref,
                                 dw2_ref):
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    g1, g2, e1, e2 = g1_ref[:], g2_ref[:], e1_ref[:], e2_ref[:]
    s1, s2 = s1_ref[:], s2_ref[:]
    n_it = nit_ref[0, 0]
    T = gys_ref.shape[0]
    x0 = x0_ref[:]
    K, I = x0.shape
    d = I // S
    exp, _ = _member_mats(S, I)
    sidx_final = mstats_ref[3]                             # [1, S] f32
    ones_k = jnp.zeros((K, 1), jnp.float32) + 1.0
    bk = (lambda v: v) if K == 1 else (lambda v: _mdot(ones_k, v))

    def chain(x):
        return _chain_f(x, c1, w1, c2, w2, g1, g2, e1, e2, spec.h,
                        spec.normalizer, spec.basis)

    def vjp_collect(x, y1_int, gy):
        return _chain_vjp_collect(x, y1_int, c1, w1, c2, w2, g1, g2,
                                  e1, e2, s1, s2, spec.h, gy,
                                  spec.normalizer, spec.basis)

    # fill cotangent: rows i >= sidx_final[s] fed member s's final state
    def fill_acc(i, acc):
        m_e = bk(_mdot((sidx_final <= i).astype(jnp.float32), exp))
        return acc + m_e * gys_ref[i]

    xbar0 = lax.fori_loop(1, T, fill_acc, jnp.zeros_like(x0),
                          unroll=False)

    zero_p = (jnp.zeros_like(c1), jnp.zeros_like(w1),
              jnp.zeros_like(c2), jnp.zeros_like(w2))

    def skip(c):
        return c

    def active(c):
        wi, xbar, k1bar, dc1, dw1, dc2, dw2 = c
        it = n_it - 1 - wi
        x_in = rx_ref[it]
        k1_in = rk1_ref[it]
        dts = rdt_ref[it]                                  # [1, S]
        acc = racc_ref[it]                                 # [1, S] f32
        sxs = rsx_ref[it]                     # [1, S] f32 (row or -1.0)

        # per-member saved-row cotangent pickup
        for s in range(S):
            row_s = _lane_scalar(jnp.maximum(sxs, 0.0),
                                 s).astype(jnp.int32)
            m_s = jnp.where(_lane_scalar(sxs, s) >= 0, 1.0, 0.0)
            cm = bk(_colmask(s, I, d).astype(jnp.float32))
            xbar = xbar + (m_s * cm) * gys_ref[row_s]

        dts_e = bk(_mdot(dts, exp))                        # [K, I]
        acc_e = bk(_mdot(acc, exp))                        # [K, I] 0/1

        ks, xs, y1s, _ = _stage_sweep(tab, chain, x_in, dts_e, k1_in)
        xbar_m = xbar * acc_e
        kbar = [None] * tab.stages
        for i in range(tab.stages):
            if tab.b[i] != 0.0:
                kbar[i] = (dts_e * tab.b[i]) * xbar_m
        # FSAL carry-out, accepted members only
        fsal = k1bar * acc_e
        kbar[-1] = fsal if kbar[-1] is None else kbar[-1] + fsal

        xbar_new = xbar          # identity path (accepted AND rejected)
        per_stage = []
        for i in range(tab.stages - 1, 0, -1):
            if kbar[i] is None:
                continue
            dxi, ops = vjp_collect(xs[i], y1s[i], kbar[i])
            per_stage.append(ops)
            xbar_new = xbar_new + dxi
            for j in range(i):
                if tab.a[i][j] != 0.0:
                    contrib = (dts_e * tab.a[i][j]) * dxi
                    kbar[j] = contrib if kbar[j] is None \
                        else kbar[j] + contrib
        # stage 1 = carried FSAL value; rejected members pass k1bar thru
        k1bar_new = k1bar * (1.0 - acc_e)
        if kbar[0] is not None:
            k1bar_new = k1bar_new + kbar[0]
        stacked = tuple(jnp.concatenate([o[i] for o in per_stage], axis=0)
                        for i in range(6))
        dc1i, dw1i, dc2i, dw2i = _chain_param_gemms(stacked)
        return (wi, xbar_new, k1bar_new,
                dc1 + dc1i, dw1 + dw1i, dc2 + dc2i, dw2 + dw2i)

    def body(wi, c):
        _, xbar, k1bar, dc1, dw1, dc2, dw2 = c
        return lax.cond(n_it - 1 - wi >= 0, active, skip,
                        (wi, xbar, k1bar, dc1, dw1, dc2, dw2))

    init = (jnp.int32(0), xbar0, jnp.zeros_like(x0)) + zero_p
    (_, xbar, k1bar, dc1, dw1, dc2, dw2) = lax.fori_loop(
        0, max_steps, body, init, unroll=False)

    # the very first k1 was f(t0, x0)
    _, y1_int = chain(x0)
    dx_k1, ops0 = vjp_collect(x0, y1_int, k1bar)
    dc1i, dw1i, dc2i, dw2i = _chain_param_gemms(ops0)

    dx0_ref[:] = xbar + dx_k1 + gys_ref[0]
    dc1_ref[:] = dc1 + dc1i
    dw1_ref[:] = dw1 + dw1i
    dc2_ref[:] = dc2 + dc2i
    dw2_ref[:] = dw2 + dw2i


def _members_fwd_call(spec, tab, rtol, atol, max_steps, ctrl, dt0, S,
                      interpret, x0, ts, c1, w1, c2, w2):
    g1, g2, e1, e2, _, _ = _consts(spec)
    T = ts.shape[0]
    K, I = x0.shape
    return pl.pallas_call(
        partial(_adaptive_members_fwd_kernel, spec, tab, rtol, atol,
                ctrl, max_steps, dt0, S),
        out_shape=(
            jax.ShapeDtypeStruct((T, K, I), jnp.float32),           # ys
            jax.ShapeDtypeStruct((max_steps, K, I), jnp.float32),   # rx
            jax.ShapeDtypeStruct((max_steps, K, I), jnp.float32),   # rk1
            jax.ShapeDtypeStruct((max_steps, 1, S), jnp.float32),   # rdt
            jax.ShapeDtypeStruct((max_steps, 1, S), jnp.float32),   # racc
            jax.ShapeDtypeStruct((max_steps, 1, S), jnp.float32),   # rsx
            jax.ShapeDtypeStruct((4, 1, S), jnp.float32),           # stats
            jax.ShapeDtypeStruct((1, 1), jnp.int32),                # n_it
        ),
        in_specs=[_vmem()] * 10,
        out_specs=(_vmem(), _vmem(), _vmem(), _vmem(), _vmem(),
                   _vmem(), _vmem(), _smem()),
        interpret=interpret,
    )(x0, ts.reshape(T, 1).astype(jnp.float32), c1, w1, c2, w2,
      g1, g2, e1, e2)


def _validate_members(spec: ChainSpec, tab: Tableau, n_members: int):
    _validate(tab)
    if spec.in_dims != spec.out_dims:
        raise ValueError("adaptive solve needs a state-to-state chain")
    if spec.in_dims % n_members:
        raise ValueError(f"state dim {spec.in_dims} not divisible by "
                         f"n_members={n_members}")


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 14, 15))
def fused_adaptive_members_odeint(spec: ChainSpec, solver: str,
                                  rtol: float, atol: float,
                                  max_steps: int, ctrl: StepController,
                                  dt0: float | None, n_members: int,
                                  x0, ts, c1, w1, c2, w2,
                                  interpret: bool | None = None,
                                  bwd_precision: str = "highest"):
    """Whole per-member bounded-adaptive solve as ONE kernel (+ ONE
    backward) — the fused analogue of `ode.odeint_members`.

    x0: [K, S*d] member-major packed batch (`models/packed.py`); the
    chain params must be block-diagonal (train through `apply_mask`).
    Each member runs its own save-clipped I/PI controller: member-
    blocked error norms, per-member dt/t/save-index/done state, and
    accept/reject decisions that never couple members — the reference's
    adaptive protocol (`LV_driver_KANODE.jl:180-184`) for every
    ensemble member at once, at fused-kernel launch cost. Gradients
    are the per-member "direct" adjoints (accepted step sizes are
    gradient constants, rejected steps gradient-transparent, identical
    to the single-member kernel's argument). `ts` cotangent is zero.

    Homogeneous packs only (one shared grid — `pack_chain`'s contract);
    heterogeneous `HeteroPacked` ensembles use the XLA path.
    """
    check_bwd_precision(bwd_precision)
    tab = get_tableau(solver)
    _validate_members(spec, tab, n_members)
    itp = _interpret_default() if interpret is None else interpret
    ys, *_ = _members_fwd_call(spec, tab, rtol, atol, max_steps, ctrl,
                               dt0, n_members, itp, x0, ts, c1, w1,
                               c2, w2)
    return ys


def _fam_fwd(spec, solver, rtol, atol, max_steps, ctrl, dt0, n_members,
             x0, ts, c1, w1, c2, w2, interpret, bwd_precision):
    tab = get_tableau(solver)
    _validate_members(spec, tab, n_members)
    itp = _interpret_default() if interpret is None else interpret
    ys, rx, rk1, rdt, racc, rsx, mstats, nit = _members_fwd_call(
        spec, tab, rtol, atol, max_steps, ctrl, dt0, n_members, itp,
        x0, ts, c1, w1, c2, w2)
    return ys, (x0, ts, c1, w1, c2, w2, rx, rk1, rdt, racc, rsx,
                mstats, nit)


def _fam_bwd(spec, solver, rtol, atol, max_steps, ctrl, dt0, n_members,
             interpret, bwd_precision, res, gys):
    (x0, ts, c1, w1, c2, w2, rx, rk1, rdt, racc, rsx,
     mstats, nit) = res
    tab = get_tableau(solver)
    itp = _interpret_default() if interpret is None else interpret
    g1, g2, e1, e2, s1, s2 = _consts(spec)
    with _prec_ctx(_BWD_PRECS[bwd_precision]):
        dx0, dc1, dw1, dc2, dw2 = pl.pallas_call(
            partial(_adaptive_members_bwd_kernel, spec, tab, max_steps,
                    n_members),
            out_shape=(
                jax.ShapeDtypeStruct(x0.shape, jnp.float32),
                jax.ShapeDtypeStruct(c1.shape, jnp.float32),
                jax.ShapeDtypeStruct(w1.shape, jnp.float32),
                jax.ShapeDtypeStruct(c2.shape, jnp.float32),
                jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            ),
            in_specs=[_vmem()] * 17 + [_smem(), _vmem()],
            interpret=itp,
        )(x0, c1, w1, c2, w2, g1, g2, e1, e2, s1, s2,
          rx, rk1, rdt, racc, rsx, mstats, nit, gys)
    return dx0, jnp.zeros_like(ts), dc1, dw1, dc2, dw2


fused_adaptive_members_odeint.defvjp(_fam_fwd, _fam_bwd)


def fused_adaptive_members_stats(spec: ChainSpec, solver: str,
                                 rtol: float, atol: float,
                                 max_steps: int, ctrl: StepController,
                                 dt0: float | None, n_members: int,
                                 x0, ts, c1, w1, c2, w2,
                                 interpret: bool | None = None):
    """Forward-only variant returning (ys, per-member stats dict) —
    the `odeint_members(return_stats=True)` parity hook."""
    tab = get_tableau(solver)
    _validate_members(spec, tab, n_members)
    itp = _interpret_default() if interpret is None else interpret
    ys, _, _, _, _, _, mstats, _ = _members_fwd_call(
        spec, tab, rtol, atol, max_steps, ctrl, dt0, n_members, itp,
        x0, ts, c1, w1, c2, w2)
    # counters live as exact-integer f32 inside the kernel (i32 [1,S]
    # vectors hit an invalid Mosaic replication relayout at loop joins)
    m = mstats.astype(jnp.int32)
    return ys, {"n_accept": m[0, 0], "n_reject": m[1, 0],
                "n_iter": m[2, 0],
                "success": m[3, 0] >= ts.shape[0]}


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
