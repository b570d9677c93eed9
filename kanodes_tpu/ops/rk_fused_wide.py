"""Wide-state fused RK-step kernels (grid-sliced wide layer).

The standard fused kernels (`ops/rk_fused.py`) materialize an
O(I^2 G) expansion matrix — fine for I <= ~40, but the Schrödinger
surrogate's 402-dim state needs 44 MB of VMEM scratch (measured compile
failure). Round 1 used input-blocked expansion GEMMs instead; profiling
showed the replication GEMMs THEMSELVES dominated the step cost (~10x
the FLOPs of the real contraction). This version exploits that the
grid values are STATIC: the wide layer is computed as G rank-2 passes,
one per grid node g —

    y1 += exp(-((norm(x) - grid_g)/h)^2) @ C1[g]      [K,Ipad]x[Ipad,H]

with zero replication cost and every array a plain Mosaic-friendly
[sublane, 128k-lane] tile.

Shapes (chain [I -> H -> I], I wide, H small):
  * I is padded to a lane multiple; padded rows of C1/W1 and padded
    COLUMNS of C2/W2 are zero, so padded lanes contribute nothing and
    their cotangents are discarded;
  * C1 is re-laid-out to [G*Ipad, H], grouped by grid node (pad_params);
  * layer 2 (wide out): ordinary GEMMs — a wide OUTPUT needs no
    special handling.

Replaces: nothing in the reference (it runs a dense Julia matmul on
CPU); this is the TPU speed path for `Schrodinger_Surrogate.jl:93-96`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kanodes_tpu.ode.tableaus import get_tableau
from kanodes_tpu.ops.kdense_pallas import (ChainSpec, _interpret_default,
                                           _norm, _dnorm, _swish, _dswish,
                                           _PREC, _BWD_PRECS, _prec_ctx,
                                           check_bwd_precision,
                                           _basis_val, _basis_du)
from kanodes_tpu.ops.rk_fused import _needed_stages, _bwd_window

Array = jax.Array

# Backward-pass dot precision (shared holder in kdense_pallas). The
# v5e MXU is bf16-native: HIGHEST (exact f32) costs 6 accumulation
# passes per GEMM, and the K=1 trajectory floor is measured to be
# EXACTLY this pass count (297 it/s at DEFAULT vs 151 at HIGHEST on
# the Schrödinger shape, while every structural change —
# dependency-depth, op batching, window size — was neutral). The
# FORWARD kernels always stay HIGHEST: the loss floor (1e-14 on
# Allen-Cahn) needs an exact forward. The BACKWARD tolerates
# bf16-grade gradient noise under Adam (validated end-to-end: equal
# best loss on the full-budget surrogate runs, see EXPERIMENTS.md),
# so it is selectable per call (bwd_precision).


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_PREC[0])


class WideSpec:
    """Static config for a wide 2-layer chain, blocked at BI lanes."""

    def __init__(self, spec: ChainSpec, block: int = 128):
        self.spec = spec
        self.block = block
        self.I = spec.in_dims
        self.H = spec.hidden
        self.O = spec.out_dims
        self.G = spec.grid_len
        if self.O != self.I:
            raise ValueError("WideSpec supports in_dims == out_dims "
                             "chains (full PDE surrogates)")
        self.Ipad = -(-self.I // block) * block
        self.Opad = self.Ipad      # RK state must keep its padded width
        self.nb = self.Ipad // block

    # constants -------------------------------------------------------------
    def grid_values(self) -> tuple:
        """Static per-node grid values (compiled into the kernel)."""
        return tuple(float(v) for v in np.linspace(
            self.spec.grid_lims[0], self.spec.grid_lims[1], self.G))

    def grid_small(self, n: int) -> np.ndarray:
        g = np.linspace(self.spec.grid_lims[0], self.spec.grid_lims[1],
                        self.G, dtype=np.float32)
        return np.tile(g, n)[None, :]

    def expand_small(self, n: int) -> np.ndarray:
        e = np.zeros((n, n * self.G), np.float32)
        for i in range(n):
            e[i, i * self.G:(i + 1) * self.G] = 1.0
        return e

    def collapse_small(self, n: int) -> np.ndarray:
        return self.expand_small(n).T.copy()


    # parameter padding -----------------------------------------------------
    def pad_params(self, c1, w1, c2, w2):
        """c1 [I*G, H] (rows i*G+g) -> [G*Ipad, H] grouped BY GRID NODE
        (rows g*Ipad+i, zero pad rows) so the kernel slices a contiguous
        [Ipad, H] block per node; w1 [I, H] -> [Ipad, H];
        c2 [H*G, O] -> [H*G, Opad]; w2 [H, O] -> [H, Opad]."""
        pad_i = self.Ipad - self.I
        c1p = jnp.pad(c1.reshape(self.I, self.G, self.H),
                      ((0, pad_i), (0, 0), (0, 0)))
        c1p = jnp.transpose(c1p, (1, 0, 2)).reshape(
            self.G * self.Ipad, self.H)
        w1p = jnp.pad(w1, ((0, pad_i), (0, 0)))
        pad_o = self.Opad - self.O
        c2p = jnp.pad(c2, ((0, 0), (0, pad_o)))
        w2p = jnp.pad(w2, ((0, 0), (0, pad_o)))
        return c1p, w1p, c2p, w2p


def _dot_t0(a, b):
    """a^T @ b without materializing the transpose (contract dim 0)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PREC[0])


def _wide_gridrow(ws: WideSpec):
    """[1, G*Ipad] per-lane grid-value row (node g fills its Ipad
    block). Built from static fills so kernels hoist it ONCE per
    launch — the basis evaluation then runs lane-replicated instead of
    as a G-iteration Python loop (the loop issued ~5 VPU ops PER NODE;
    the K=1 trajectory floor is per-op issue cost, so G x fewer issues
    at identical element count is the whole point)."""
    return jnp.concatenate([jnp.full((1, ws.Ipad), gv, jnp.float32)
                            for gv in ws.grid_values()], axis=1)


def _wide_basis(ws: WideSpec, xn, gwide):
    """B [K, G*Ipad]: RBF values against every static grid node,
    concatenated in c1p's row order — ~4 lane-replicated VPU ops
    regardless of G."""
    inv_h = 1.0 / ws.spec.h
    xrep = jnp.concatenate([xn] * ws.G, axis=1)
    u = (xrep - gwide) * inv_h
    return _basis_val(u, ws.spec.basis)


def _wide_basis_db(ws: WideSpec, xn, gwide):
    """(B, dB) with dB = dB/dxn = -2/h * u * B — dB is consumed by the
    backward's dx-path, so building it here (batched in the window
    rebuild, off the critical path) halves the per-node FMA loop body
    of the sequential reverse chain."""
    inv_h = 1.0 / ws.spec.h
    xrep = jnp.concatenate([xn] * ws.G, axis=1)
    u = (xrep - gwide) * inv_h
    B = _basis_val(u, ws.spec.basis)
    return B, inv_h * _basis_du(u, B, ws.spec.basis)


def _wide_layer1_fwd(ws: WideSpec, x, c1, w1, gwide):
    """Wide-input layer as ONE long-contraction GEMM: x [K, Ipad] ->
    y1 [K, H] via [K, G*Ipad] x [G*Ipad, H] (grid values are static, so
    the basis needs no replication GEMM)."""
    xn = _norm(x, ws.spec.normalizer)
    B = _wide_basis(ws, xn, gwide)
    return _dot(_swish(x), w1) + _dot(B, c1)


def _wide_layer1_fwd_vpu(ws: WideSpec, x, cm1, eyeH, gwide):
    """K == 1 wide-input layer on the VPU: at M = 1 the MXU GEMM is
    weight-streaming-bound — 40 depth-tiles x 6 f32-emulation passes
    stream the whole [G*Ipad, H] weight through the systolic array to
    multiply ONE row (the measured trajectory-mode forward floor).
    The same contraction is ~130 VPU vreg-ops: sublane-broadcast the
    [1, GI+Ipad] basis/swish row against the merged weight transpose
    cm1 [H, GI+Ipad], lane-reduce, and un-transpose the [H, 1] result
    with one tiny eyeH pass. Exact f32 (mul + f32 adds) — NOT a
    precision trade, unlike bwd_precision="bf16"."""
    xn = _norm(x, ws.spec.normalizer)
    B = _wide_basis(ws, xn, gwide)
    row = jnp.concatenate([B, _swish(x)], axis=1)      # [1, GI + Ipad]
    y1T = jnp.sum(row * cm1, axis=1, keepdims=True)    # [H, 1]
    return _dot_t0(y1T, eyeH)                          # [1, H]


def _small_layer_fwd(ws: WideSpec, y1, c2, w2, gsm, esm):
    """Narrow-input layer: y1 [K, H] -> y2 [K, Opad]."""
    h = ws.spec.h
    xn = _norm(y1, ws.spec.normalizer)
    rep = _dot(xn, esm)
    u = (rep - gsm) * (1.0 / h)
    basis = _basis_val(u, ws.spec.basis)               # [K, H*G]
    return _dot(basis, c2) + _dot(_swish(y1), w2), u, basis


def _chain_f_wide(ws, x, c1, w1, c2, w2, gsm, esm, gwide, vpu=None):
    if vpu is not None and x.shape[0] == 1:
        y1 = _wide_layer1_fwd_vpu(ws, x, vpu[0], vpu[1], gwide)
    else:
        y1 = _wide_layer1_fwd(ws, x, c1, w1, gwide)
    y2, _, _ = _small_layer_fwd(ws, y1, c2, w2, gsm, esm)
    return y2, y1


def _chain_vjp_wide_dx(ws, x, y1, c1, w1, c2, w2, gsm, esm, ssm, gy,
                       B=None, dB=None):
    """dx-path of the chain VJP. Parameter cotangents are DEFERRED:
    returns (dx, dy1, B, b2) so the caller can batch every stage's
    dc1/dw1/dc2/dw2 into ONE GEMM each per RK step — the per-stage
    param GEMMs are tiny-contraction/tile-latency-bound and dominated
    the backward kernel. Pass the stage's (B, dB) from the rebuild
    phase to skip recomputing them."""
    h = ws.spec.h
    # small layer dx-path
    xn2 = _norm(y1, ws.spec.normalizer)
    rep = _dot(xn2, esm)
    u2 = (rep - gsm) * (1.0 / h)
    b2 = _basis_val(u2, ws.spec.basis)                 # [K, H*G]
    m2 = _dot(gy, c2.T)
    drep = m2 * _basis_du(u2, b2, ws.spec.basis) * (1.0 / h)
    dxn2 = _dot(drep, ssm)
    dy1 = dxn2 * _dnorm(y1, ws.spec.normalizer) \
        + _dot(gy, w2.T) * _dswish(y1)
    # wide layer dx-path: per-node FMA loop over the precomputed dB
    # slices. (A [G*Ipad, Ipad] 0/1 collapse GEMM was tried instead and
    # REGRESSED 4x: at K<=8 that GEMM is MXU weight-streaming-bound —
    # 160 tile passes per stage — while the VPU loop is ~10 cheap
    # [K, Ipad] FMAs.)
    if B is None or dB is None:
        B, dB = _wide_basis_db(ws, _norm(x, ws.spec.normalizer),
                               _wide_gridrow(ws))
    Ipad = ws.Ipad
    m = _dot(dy1, c1.T)                                # [K, G*Ipad]
    mdB = m * dB
    dxn = jnp.zeros_like(x)
    for g in range(ws.G):
        dxn = dxn + mdB[:, g * Ipad:(g + 1) * Ipad]
    dx = dxn * _dnorm(x, ws.spec.normalizer) \
        + _dot(dy1, w1.T) * _dswish(x)
    return dx, dy1, B, b2


def _tree_collapse(mdB, G: int, Ipad: int):
    """Sum the G contiguous [K, Ipad] blocks of mdB in log depth (the
    naive accumulation is G serialized VPU adds on the critical path;
    halving block counts with progressively wider adds issues ~log2(G)
    ops instead — lane width is nearly free, issue slots are not)."""
    cur, n, carry = mdB, G, None
    while n > 1:
        if n % 2:
            last = cur[:, (n - 1) * Ipad:n * Ipad]
            carry = last if carry is None else carry + last
            n -= 1
        half = n // 2
        cur = cur[:, :half * Ipad] + cur[:, half * Ipad:n * Ipad]
        n = half
    out = cur[:, :Ipad]
    return out + carry if carry is not None else out


def _chain_vjp_wide_dx_pre(ws, st, i, rows, cm1, cm2, ssm, gy):
    """dx-path of the chain VJP with ALL forward intermediates
    precomputed by `_window_rebuild` (st dict, stage i, row slice) —
    the sequential chain is pure cotangent algebra: 3 GEMMs (merged
    weight transposes cm2 = [c2|w2]^T, cm1 = [c1|w1]^T) plus ~8 VPU
    ops per stage, with the per-node collapse tree-reduced."""
    HG = ws.H * ws.G
    t2 = _dot(gy, cm2)                                 # [K, H*G + H]
    drep = t2[:, :HG] * st["D2s"][i][rows]
    dxn2 = _dot(drep, ssm)
    dy1 = dxn2 * st["dny1s"][i][rows] + t2[:, HG:] * st["dsy1s"][i][rows]
    Ipad = ws.Ipad
    GI = ws.G * Ipad
    t1 = _dot(dy1, cm1)                                # [K, G*Ipad + Ipad]
    mdB = t1[:, :GI] * st["dBs"][i][rows]
    dxn = _tree_collapse(mdB, ws.G, Ipad)
    dx = dxn * st["dnxs"][i][rows] + t1[:, GI:] * st["dsxs"][i][rows]
    return dx, dy1


def _window_rebuild(ws, tab, dt, needed, Xb, c1, w1, c2, w2, gsm, esm,
                    gwide):
    """Batched stage rebuild for a whole WINDOW of steps at once: steps
    are independent given their stored input states, so one pass over
    the stages at [W*K, ...] replaces W sequential per-step rebuilds.

    Returns a dict of per-stage lists (None where the stage is pruned):
      xs, y1s, Bs, b2s      — forward intermediates (param-GEMM operands)
      dBs                   — wide-basis derivative for the dx collapse
      D2s = -2/h * u2 * b2  — small-layer basis-derivative factor
      dnxs/dsxs, dny1s/dsy1s — dnorm/dswish of x and y1
    Everything a backward stage needs besides its COTANGENT is computed
    here, batched, so the sequential chain is pure cotangent algebra
    (every hoisted term removes serialized VPU issue slots from the
    critical path, which is what bounds K=1 trajectory mode)."""
    h = ws.spec.h
    S = tab.stages
    out = {k: [None] * S for k in ("xs", "y1s", "Bs", "dBs", "b2s",
                                   "D2s", "dnxs", "dsxs", "dny1s",
                                   "dsy1s")}
    ks = [None] * S
    for i in range(S):
        if not needed[i]:
            continue
        xi = Xb
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                xi = xi + (dt * tab.a[i][j]) * ks[j]
        out["xs"][i] = xi
        B, dB = _wide_basis_db(ws, _norm(xi, ws.spec.normalizer), gwide)
        out["Bs"][i], out["dBs"][i] = B, dB
        y1 = _dot(_swish(xi), w1) + _dot(B, c1)
        out["y1s"][i] = y1
        ks[i], u2, b2 = _small_layer_fwd(ws, y1, c2, w2, gsm, esm)
        out["b2s"][i] = b2
        out["D2s"][i] = _basis_du(u2, b2, ws.spec.basis) * (1.0 / h)
        out["dnxs"][i] = _dnorm(xi, ws.spec.normalizer)
        out["dsxs"][i] = _dswish(xi)
        out["dny1s"][i] = _dnorm(y1, ws.spec.normalizer)
        out["dsy1s"][i] = _dswish(y1)
    return out


def _step_adjoint_wide_collect(ws, tab, dt, needed, x, xbar, c1, w1, c2,
                               w2, gsm, esm, ssm):
    """One-step discrete adjoint at input state x with output cotangent
    xbar — dx-chain only. Parameter cotangents are NOT formed; instead
    the stacked GEMM operands are returned so the caller can batch them
    across stages AND across steps:
      returns (dx, (B [S*K, G*Ipad], b2 [S*K, H*G], D [S*K, H],
                    Kc [S*K, Opad], swx [S*K, Ipad], swy1 [S*K, H]))
    with dc1 = B^T D, dw1 = swx^T D, dc2 = b2^T Kc, dw2 = swy1^T Kc."""
    gwide = _wide_gridrow(ws)
    ks = [None] * tab.stages
    xs = [None] * tab.stages
    y1s = [None] * tab.stages
    Bsaved = [None] * tab.stages
    dBsaved = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        xi = x
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                xi = xi + (dt * tab.a[i][j]) * ks[j]
        xs[i] = xi
        Bsaved[i], dBsaved[i] = _wide_basis_db(
            ws, _norm(xi, ws.spec.normalizer), gwide)
        y1s[i] = _dot(_swish(xi), w1) + _dot(Bsaved[i], c1)
        ks[i], _, _ = _small_layer_fwd(ws, y1s[i], c2, w2, gsm, esm)

    dx = xbar
    kbar = [None] * tab.stages
    for i in range(tab.stages):
        if needed[i] and tab.b[i] != 0.0:
            kbar[i] = (dt * tab.b[i]) * xbar
    Bs, b2s, dy1s, kbars, swxs, swy1s = [], [], [], [], [], []
    for i in range(tab.stages - 1, -1, -1):
        if not needed[i] or kbar[i] is None:
            continue
        dxi, dy1_i, B_i, b2_i = _chain_vjp_wide_dx(
            ws, xs[i], y1s[i], c1, w1, c2, w2, gsm, esm, ssm,
            kbar[i], B=Bsaved[i], dB=dBsaved[i])
        Bs.append(B_i)
        b2s.append(b2_i)
        dy1s.append(dy1_i)
        kbars.append(kbar[i])
        swxs.append(_swish(xs[i]))
        swy1s.append(_swish(y1s[i]))
        dx = dx + dxi
        for j in range(i):
            if tab.a[i][j] != 0.0 and needed[j]:
                contrib = (dt * tab.a[i][j]) * dxi
                kbar[j] = contrib if kbar[j] is None else kbar[j] + contrib

    return dx, (jnp.concatenate(Bs, axis=0),
                jnp.concatenate(b2s, axis=0),
                jnp.concatenate(dy1s, axis=0),
                jnp.concatenate(kbars, axis=0),
                jnp.concatenate(swxs, axis=0),
                jnp.concatenate(swy1s, axis=0))


def _param_gemms(ops):
    """(B, b2, D, Kc, swx, swy1) stacked over any number of stages/steps
    -> (dc1, dw1, dc2, dw2) via four GEMMs."""
    B, b2, D, Kc, swx, swy1 = ops
    return (_dot_t0(B, D), _dot_t0(swx, D),
            _dot_t0(b2, Kc), _dot_t0(swy1, Kc))


def _step_adjoint_wide(ws, tab, dt, needed, x, xbar, c1, w1, c2, w2,
                       gsm, esm, ssm):
    """One-step discrete adjoint: dx-chain + per-step-batched parameter
    GEMMs (single-step kernels; the multistep backward batches the GEMMs
    across a WINDOW of steps instead)."""
    dx, ops = _step_adjoint_wide_collect(ws, tab, dt, needed, x, xbar,
                                         c1, w1, c2, w2, gsm, esm, ssm)
    dc1, dw1, dc2, dw2 = _param_gemms(ops)
    return dx, dc1, dw1, dc2, dw2


def _wide_step_fwd_kernel(ws, tab, dt, needed,
                          x_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                          gsm_ref, esm_ref, y_ref):
    x = x_ref[:]
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    gsm, esm = gsm_ref[:], esm_ref[:]
    gwide = _wide_gridrow(ws)
    ks = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        xi = x
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                xi = xi + (dt * tab.a[i][j]) * ks[j]
        ks[i], _ = _chain_f_wide(ws, xi, c1, w1, c2, w2, gsm, esm, gwide)
    y = x
    for i in range(tab.stages):
        if tab.b[i] != 0.0:
            y = y + (dt * tab.b[i]) * ks[i]
    y_ref[:] = y


def _wide_step_bwd_kernel(ws, tab, dt, needed,
                          x_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                          gsm_ref, esm_ref, ssm_ref, gy_ref,
                          dx_ref, dc1_ref, dw1_ref, dc2_ref, dw2_ref):
    dx, dc1, dw1, dc2, dw2 = _step_adjoint_wide(
        ws, tab, dt, needed, x_ref[:], gy_ref[:],
        c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:],
        gsm_ref[:], esm_ref[:], ssm_ref[:])
    dx_ref[:] = dx
    dc1_ref[:] = dc1
    dw1_ref[:] = dw1
    dc2_ref[:] = dc2
    dw2_ref[:] = dw2


def _wide_consts(ws: WideSpec):
    return (jnp.asarray(ws.grid_small(ws.H)),
            jnp.asarray(ws.expand_small(ws.H)),
            jnp.asarray(ws.collapse_small(ws.H)))


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 8))
def fused_rk_step_wide(ws: WideSpec, solver: str, dt: float,
                       x, c1p, w1p, c2p, w2p,
                       interpret: bool | None = None):
    """One whole RK step on a PADDED wide state x [K, Ipad] with padded
    params (see WideSpec.pad_params). Returns y [K, Ipad]."""
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    gsm, esm, _ = _wide_consts(ws)
    kw = {} if itp else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}
    return pl.pallas_call(
        partial(_wide_step_fwd_kernel, ws, tab, dt, needed),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=itp, **kw,
    )(x, c1p, w1p, c2p, w2p, gsm, esm)


def _frsw_fwd(ws, solver, dt, x, c1p, w1p, c2p, w2p, interpret):
    y = fused_rk_step_wide(ws, solver, dt, x, c1p, w1p, c2p, w2p,
                           interpret)
    return y, (x, c1p, w1p, c2p, w2p)


def _frsw_bwd(ws, solver, dt, interpret, res, gy):
    x, c1p, w1p, c2p, w2p = res
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    gsm, esm, ssm = _wide_consts(ws)
    kw = {} if itp else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}
    dx, dc1, dw1, dc2, dw2 = pl.pallas_call(
        partial(_wide_step_bwd_kernel, ws, tab, dt, needed),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct(c1p.shape, jnp.float32),
            jax.ShapeDtypeStruct(w1p.shape, jnp.float32),
            jax.ShapeDtypeStruct(c2p.shape, jnp.float32),
            jax.ShapeDtypeStruct(w2p.shape, jnp.float32),
        ),
        interpret=itp, **kw,
    )(x, c1p, w1p, c2p, w2p, gsm, esm, ssm, gy)
    return dx, dc1, dw1, dc2, dw2


fused_rk_step_wide.defvjp(_frsw_fwd, _frsw_bwd)


# ---------------------------------------------------------------------------
# multi-step fused WIDE kernels: N whole RK steps per kernel launch
# (wide counterpart of ops/rk_fused.fused_rk_multistep — cuts the
# per-step Pallas launch cost, which dominates the Schrödinger
# surrogate's 20-40-step segment solves)
# ---------------------------------------------------------------------------

def _wide_one_step(ws, tab, dt, needed, x, c1, w1, c2, w2, gsm, esm,
                   gwide, vpu=None):
    ks = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        xi = x
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                xi = xi + (dt * tab.a[i][j]) * ks[j]
        ks[i], _ = _chain_f_wide(ws, xi, c1, w1, c2, w2, gsm, esm, gwide,
                                 vpu)
    y = x
    for i in range(tab.stages):
        if tab.b[i] != 0.0:
            y = y + (dt * tab.b[i]) * ks[i]
    return y


def _wide_multistep_fwd_kernel(ws, tab, dt, needed, n_steps,
                               x_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                               gsm_ref, esm_ref,
                               ys_ref):
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    gsm, esm = gsm_ref[:], esm_ref[:]
    gwide = _wide_gridrow(ws)
    vpu = None
    if x_ref.shape[0] == 1:
        # merged weight transpose + un-transpose identity for the VPU
        # wide dot, hoisted once per launch
        vpu = (jnp.concatenate([c1.T, w1.T], axis=1),
               jnp.eye(ws.H, dtype=jnp.float32))

    def body(s, x):
        y = _wide_one_step(ws, tab, dt, needed, x, c1, w1, c2, w2,
                           gsm, esm, gwide, vpu)
        ys_ref[s] = y
        return y

    jax.lax.fori_loop(0, n_steps, body, x_ref[:], unroll=False)


def _wide_multistep_bwd_kernel(ws, tab, dt, needed, n_steps, window,
                               x0_ref, ys_ref, c1_ref, w1_ref, c2_ref,
                               w2_ref, gsm_ref, esm_ref, ssm_ref,
                               gys_ref,
                               dx_ref, dc1_ref, dw1_ref, dc2_ref, dw2_ref,
                               d_scr, k_scr):
    """Reverse sweep over the stored per-step states (discrete adjoint),
    folding in the cotangent of every saved state.

    Steps are processed in unrolled windows of `window` (a divisor of
    n_steps):
      * the STAGE REBUILD runs once per window, batched over the
        window's steps at [W*K, ...] (steps are independent given the
        stored states) — W sequential rebuilds become one;
      * the irreducibly sequential per-step dx-chain consumes slices of
        the batched intermediates;
      * every window's parameter cotangents collapse into FOUR GEMMs."""
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    gsm, esm, ssm = gsm_ref[:], esm_ref[:], ssm_ref[:]
    K = x0_ref.shape[0]
    # merged weight transposes, built once per launch (3 GEMMs/stage on
    # the sequential chain instead of 5)
    cm2 = jnp.concatenate([c2.T, w2.T], axis=1)       # [Opad, H*G+H]
    cm1 = jnp.concatenate([c1.T, w1.T], axis=1)       # [H, G*Ipad+Ipad]
    gwide = _wide_gridrow(ws)

    def body(wi, carry):
        xbar, dc1, dw1, dc2, dw2 = carry
        # ---- ONE contiguous block read per buffer per window (the
        # former per-step dynamic row gathers + 8-way concats measured
        # 4.9 us/step by themselves). Rows are kept in ASCENDING step
        # order; the reverse sweep just remaps its row slice.
        s_lo = n_steps - window - wi * window         # first step of win
        blk = ys_ref[pl.ds(jnp.maximum(s_lo - 1, 0), window)]
        blk = blk.reshape(window * K, ws.Ipad)
        # row u*K:(u+1)*K holds the INPUT state of step s_lo + u; the
        # first window of the whole sweep (s_lo == 0) substitutes x0.
        # window == 1 keeps x0 alone: blk[:-K] would be a zero-row
        # slice, which Mosaic rejects ("positive constant sizes").
        shifted = x0_ref[:] if window == 1 else \
            jnp.concatenate([x0_ref[:], blk[:-K]], axis=0)
        Xb = jnp.where(s_lo == 0, shifted, blk)
        gys_win = gys_ref[pl.ds(s_lo, window)].reshape(window * K,
                                                       ws.Ipad)
        st = _window_rebuild(ws, tab, dt, needed, Xb, c1, w1, c2, w2,
                             gsm, esm, gwide)

        # ---- sequential reverse dx-chain, one step at a time. Only the
        # tiny per-stage COTANGENT rows (kbar [K, Opad], dy1 [K, H]) are
        # collected here — stored straight into VMEM scratch at static
        # row offsets (flat many-way concats of these rows were ~7
        # us/step of serialized copy issues; functional .at / dus row
        # updates don't lower on Mosaic); the bulky param-GEMM operands
        # (B, b2, swish terms) already exist window-batched from the
        # rebuild and stack with one 4-way concat each.
        # Every needed stage can receive cotangent (via b_i OR a later
        # stage's a_ji); stages that end up with none get zeros stored,
        # contributing nothing to the GEMMs.
        live = [i for i in range(tab.stages) if needed[i]]
        pos = {i: p for p, i in enumerate(live)}
        WK = window * K
        for u in range(window - 1, -1, -1):           # step s_lo+u, desc
            rows = slice(u * K, (u + 1) * K)
            xbar = xbar + gys_win[rows]
            dx = xbar
            kbar = [None] * tab.stages
            for i in range(tab.stages):
                if needed[i] and tab.b[i] != 0.0:
                    kbar[i] = (dt * tab.b[i]) * xbar
            seen = set()
            for i in range(tab.stages - 1, -1, -1):
                if not needed[i] or kbar[i] is None:
                    continue
                dxi, dy1_i = _chain_vjp_wide_dx_pre(
                    ws, st, i, rows, cm1, cm2, ssm, kbar[i])
                r0 = pos[i] * WK + u * K
                d_scr[r0:r0 + K] = dy1_i
                k_scr[r0:r0 + K] = kbar[i]
                seen.add(i)
                dx = dx + dxi
                for j in range(i):
                    if tab.a[i][j] != 0.0 and needed[j]:
                        contrib = (dt * tab.a[i][j]) * dxi
                        kbar[j] = contrib if kbar[j] is None \
                            else kbar[j] + contrib
            for i in live:
                if i not in seen:
                    r0 = pos[i] * WK + u * K
                    d_scr[r0:r0 + K] = jnp.zeros((K, ws.H), jnp.float32)
                    k_scr[r0:r0 + K] = jnp.zeros((K, ws.Opad),
                                                 jnp.float32)
            xbar = dx

        # ---- FOUR window-batched parameter GEMMs (stage-major row
        # order on both sides)
        D_all = d_scr[:]
        K_all = k_scr[:]
        B_all = jnp.concatenate([st["Bs"][i] for i in live], axis=0)
        b2_all = jnp.concatenate([st["b2s"][i] for i in live], axis=0)
        swx_all = _swish(jnp.concatenate(
            [st["xs"][i] for i in live], axis=0))
        swy1_all = _swish(jnp.concatenate(
            [st["y1s"][i] for i in live], axis=0))
        return (xbar,
                dc1 + _dot_t0(B_all, D_all),
                dw1 + _dot_t0(swx_all, D_all),
                dc2 + _dot_t0(b2_all, K_all),
                dw2 + _dot_t0(swy1_all, K_all))

    init = (jnp.zeros_like(x0_ref[:]), jnp.zeros_like(c1),
            jnp.zeros_like(w1), jnp.zeros_like(c2), jnp.zeros_like(w2))
    dx, dc1, dw1, dc2, dw2 = jax.lax.fori_loop(0, n_steps // window, body,
                                               init, unroll=False)
    dx_ref[:] = dx
    dc1_ref[:] = dc1
    dw1_ref[:] = dw1
    dc2_ref[:] = dc2
    dw2_ref[:] = dw2


def _lowrank_batch_consts(ws: WideSpec, tab, dt: float, live,
                          window: int) -> tuple:
    """Static matrices for the low-rank step-Jacobian backward.

    The chain RHS factors EXACTLY through the H-dim hidden layer:
    df/dx|_{stage i} = A_i B_i^T with A_i = dk/dy1 [n, H] and
    B_i^T = dy1/dx [H, n].  Unrolling the RK recursion
    dk_i/dx = A_i B_i^T (I + dt sum_j a_ij dk_j/dx) gives the step
    Jacobian in closed low-rank form

        J_step = I + U Ds (I - L)^{-1} V,   rank <= S*H,

    with U = [A_1 .. A_S] (column blocks), V = [B_1^T; ..; B_S^T]
    (row blocks), Ds = blockdiag(dt b_i I_H) and L strictly
    block-lower-triangular, L_ij = dt a_ij (B_i^T A_j), nilpotent of
    index <= S, so (I-L)^{-1} = I + L + ... + L^{S-1} exactly.

    The measured K=1 floor is per-op issue cost (~0.4-0.5 us/op,
    NEXT_STEPS round-3 findings), so EVERY phase here is expressed as
    a handful of window-batched ops: the factor rows build
    stage-stacked, expand to the per-(step, stage, h) u-major layout
    through one static 0/1 selector GEMM (Mosaic cannot concatenate
    lane-offset slices, and sub-tile broadcasts are banned — constant
    selector contractions are the repo-wide substitute, see
    ChainSpec.expand/collapse), all W per-step L matrices come from ONE
    cross GEMM + block-diag mask + column collapse, the triangular
    solve runs as an (S-1)-term Horner recurrence on the critical path
    (Ds pre-folded into the A factor rows), and the per-stage hidden
    cotangents t_u — which ARE dy1bar — drive batched kbar recovery
    and the 0/1-reordered parameter GEMMs.

    Row layouts: "u-major" r = u*SH + pi*H + h (adjoint-chain objects),
    "pi-major" r = pi*W + u (param-GEMM operands, matching the
    stage-concatenated rebuild arrays)."""
    H, G = ws.H, ws.G
    Sl = len(live)
    SH = Sl * H
    W = window
    WSH = W * SH
    # [maskE | eyeH]: turns the per-(step, stage) row [D2dn | dsy1]
    # into the block-diag coefficient matrix of A_i^T
    maskC = np.zeros((H, H * G + H), np.float32)
    for h in range(H):
        maskC[h, h * G:(h + 1) * G] = 1.0
        maskC[h, H * G + h] = 1.0
    maskC_big = np.zeros((WSH, H * G + H), np.float32)
    tileH = np.zeros((WSH, H), np.float32)
    EselV = np.zeros((WSH, Sl * W), np.float32)
    dtbcol = np.zeros((WSH, 1), np.float32)
    for u in range(W):
        for pi in range(Sl):
            for h in range(H):
                r = u * SH + pi * H + h
                maskC_big[r] = maskC[h]
                tileH[r, h] = 1.0
                EselV[r, pi * W + u] = 1.0
                dtbcol[r, 0] = dt * tab.b[live[pi]]
    acoef = np.zeros((SH, SH), np.float32)
    kcoef = np.zeros((Sl, SH), np.float32)
    for pi, i in enumerate(live):
        for pj, j in enumerate(live):
            if j < i and tab.a[i][j] != 0.0:
                acoef[pi * H:(pi + 1) * H, pj * H:(pj + 1) * H] = \
                    dt * tab.a[i][j]
            if j > i and tab.a[j][i] != 0.0:
                kcoef[pi, pj * H:(pj + 1) * H] = dt * tab.a[j][i]
    acoef_bd = np.zeros((WSH, WSH), np.float32)
    colselSH = np.zeros((WSH, SH), np.float32)
    for u in range(W):
        acoef_bd[u * SH:(u + 1) * SH, u * SH:(u + 1) * SH] = acoef
        colselSH[u * SH:(u + 1) * SH] = np.eye(SH, dtype=np.float32)
    # kbar recovery: K_big[u*Sl+pi] = (kcoef[pi] . t_u) @ V_big block u
    #                                 + dt b_i * a_u
    E2w = np.zeros((W * Sl, W), np.float32)
    kmask_bd = np.zeros((W * Sl, WSH), np.float32)
    dtbc_exp = np.zeros((W * Sl, W), np.float32)
    for u in range(W):
        for pi in range(Sl):
            r = u * Sl + pi
            E2w[r, u] = 1.0
            kmask_bd[r, u * SH:(u + 1) * SH] = kcoef[pi]
            dtbc_exp[r, u] = dt * tab.b[live[pi]]
    TileW = np.concatenate([np.eye(SH, dtype=np.float32)] * W, axis=1)
    # D_all / K_all reorder into the pi-major param-GEMM layout
    esel = np.zeros((Sl * W, W), np.float32)
    dmask = np.zeros((Sl * W, SH), np.float32)
    ksel = np.zeros((Sl * W, W * Sl), np.float32)
    for pi in range(Sl):
        for u in range(W):
            r = pi * W + u
            esel[r, u] = 1.0
            dmask[r, pi * H:(pi + 1) * H] = 1.0
            ksel[r, u * Sl + pi] = 1.0
    cselH = np.concatenate([np.eye(H, dtype=np.float32)] * Sl, axis=0)
    return (maskC_big, tileH, EselV, dtbcol, acoef_bd, colselSH,
            E2w, TileW, kmask_bd, dtbc_exp, esel, dmask, ksel, cselH)


def _dot_t1(a, b):
    """a @ b^T without materializing the transpose (contract dim 1)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PREC[0])


def _wide_multistep_bwd_kernel_lr(ws, tab, dt, needed, n_steps, window,
                                  x0_ref, ys_ref, c1_ref, w1_ref, c2_ref,
                                  w2_ref, gsm_ref, esm_ref,
                                  maskC_ref, tileH_ref, EselV_ref,
                                  dtbcol_ref, acoefbd_ref, colsel_ref,
                                  E2w_ref, TileW_ref, kmaskbd_ref,
                                  dtbce_ref, esel_ref, dmask_ref,
                                  ksel_ref, cselH_ref, gys_ref,
                                  dx_ref, dc1_ref, dw1_ref, dc2_ref,
                                  dw2_ref):
    """K=1 (single-trajectory) backward via the low-rank step Jacobian.

    Identical discrete adjoint to `_wide_multistep_bwd_kernel`,
    restructured so the irreducibly sequential part is 3 GEMMs + 2 adds
    per step; EVERYTHING else — factor-row construction, the U/V
    expansion, all W per-step L matrices, the nilpotent triangular
    solve, and the per-stage cotangent recovery — runs window-batched
    in a fixed handful of ops (the measured floor is per-op issue cost,
    not FLOPs; see `_lowrank_batch_consts`)."""
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    gsm, esm = gsm_ref[:], esm_ref[:]
    maskC, tileH, EselV = maskC_ref[:], tileH_ref[:], EselV_ref[:]
    dtbcol, acoefbd, colsel = dtbcol_ref[:], acoefbd_ref[:], colsel_ref[:]
    E2w, TileW, kmaskbd = E2w_ref[:], TileW_ref[:], kmaskbd_ref[:]
    dtbce, esel, dmask = dtbce_ref[:], esel_ref[:], dmask_ref[:]
    ksel, cselH = ksel_ref[:], cselH_ref[:]
    K = x0_ref.shape[0]          # == 1
    H, G, Ipad = ws.H, ws.G, ws.Ipad
    GI = G * Ipad
    live = [i for i in range(tab.stages) if needed[i]]
    Sl = len(live)
    SH = Sl * H
    cm1 = jnp.concatenate([c1.T, w1.T], axis=1)       # [H, GI + Ipad]
    cm2e = jnp.concatenate([c2, w2], axis=0)          # [H*G + H, Opad]
    cm1_big = _dot(tileH, cm1)                        # [W*SH, GI + Ipad]
    gwide = _wide_gridrow(ws)

    def body(wi, carry):
        xbar, dc1, dw1, dc2, dw2 = carry
        s_lo = n_steps - window - wi * window
        blk = ys_ref[pl.ds(jnp.maximum(s_lo - 1, 0), window)]
        blk = blk.reshape(window * K, ws.Ipad)
        shifted = x0_ref[:] if window == 1 else \
            jnp.concatenate([x0_ref[:], blk[:-K]], axis=0)
        Xb = jnp.where(s_lo == 0, shifted, blk)
        gys_win = gys_ref[pl.ds(s_lo, window)].reshape(window * K,
                                                       ws.Ipad)
        st = _window_rebuild(ws, tab, dt, needed, Xb, c1, w1, c2, w2,
                             gsm, esm, gwide)

        # ---- batched factor rows, stage-stacked (pi-major r = pi*W+u)
        D2_all = jnp.concatenate([st["D2s"][i] for i in live], axis=0)
        dny1_all = jnp.concatenate([st["dny1s"][i] for i in live],
                                   axis=0)
        dsy1_all = jnp.concatenate([st["dsy1s"][i] for i in live],
                                   axis=0)
        RA = jnp.concatenate([D2_all * _dot(dny1_all, esm), dsy1_all],
                             axis=1)                  # [Sl*W, HG + H]
        dB_all = jnp.concatenate([st["dBs"][i] for i in live], axis=0)
        dnx_all = jnp.concatenate([st["dnxs"][i] for i in live], axis=0)
        dsx_all = jnp.concatenate([st["dsxs"][i] for i in live], axis=0)
        RV = jnp.concatenate(
            [dB_all * jnp.concatenate([dnx_all] * G, axis=1), dsx_all],
            axis=1)                                   # [Sl*W, GI + Ipad]

        # ---- expand to u-major (r = u*SH + pi*H + h) via selector GEMM
        A_big = _dot(maskC * _dot(EselV, RA), cm2e)   # [W*SH, Opad]
        full_big = cm1_big * _dot(EselV, RV)          # [W*SH, GI + Ipad]
        V_big = _tree_collapse(full_big[:, :GI], G, Ipad) \
            + full_big[:, GI:]                        # [W*SH, Ipad]

        # ---- ALL W per-step L matrices from ONE cross GEMM; the
        # nilpotent solve T = I + L + ... + L^{Sl-1} Horner-batched over
        # the window (block-diag Lbd x block-stacked rows = per-block
        # products; colsel doubles as the block-stacked identity)
        Lbd = _dot_t1(V_big, A_big) * acoefbd         # [W*SH, W*SH]
        T = colsel                                    # [W*SH, SH]
        for _ in range(Sl - 1):
            T = colsel + _dot(Lbd, T)
        Tb = dtbcol * T                               # rows: Ds T_u

        # ---- sequential reverse chain: 3 GEMMs + 2 adds per step ------
        ts = [None] * window
        avs = [None] * window
        for u in range(window - 1, -1, -1):
            rows = slice(u * SH, (u + 1) * SH)
            a = xbar + gys_win[u * K:(u + 1) * K]
            s = _dot_t1(a, A_big[rows])               # [K, SH]
            t = _dot(s, Tb[rows])                     # [K, SH]
            xbar = a + _dot(t, V_big[rows])
            ts[u] = t
            avs[u] = a

        # ---- batched per-stage cotangent recovery ---------------------
        # kbar_{u,i} = (kcoef_i . t_u) @ V_u + dt b_i a_u, all (u, i) at
        # once: tile t_u across the W column blocks, mask with the
        # block-diag kcoef, one GEMM against V_big.  (Mosaic cannot
        # concatenate lane-offset slices — every reorder is a static
        # 0/1 selector GEMM, the repo-wide rule.)
        T_all = jnp.concatenate(ts, axis=0)           # [W, SH]
        A_rows = jnp.concatenate(avs, axis=0)         # [W, Ipad]
        Mwide = _dot(_dot(E2w, T_all), TileW)         # [W*Sl, W*SH]
        KB_big = _dot(Mwide * kmaskbd, V_big) \
            + _dot(dtbce, A_rows)                     # [W*Sl, Ipad]
        D_all = _dot(_dot(esel, T_all) * dmask, cselH)   # [Sl*W, H]
        K_all = _dot(ksel, KB_big)                    # [Sl*W, Ipad]
        B_all = jnp.concatenate([st["Bs"][i] for i in live], axis=0)
        b2_all = jnp.concatenate([st["b2s"][i] for i in live], axis=0)
        swx_all = _swish(jnp.concatenate(
            [st["xs"][i] for i in live], axis=0))
        swy1_all = _swish(jnp.concatenate(
            [st["y1s"][i] for i in live], axis=0))
        return (xbar,
                dc1 + _dot_t0(B_all, D_all),
                dw1 + _dot_t0(swx_all, D_all),
                dc2 + _dot_t0(b2_all, K_all),
                dw2 + _dot_t0(swy1_all, K_all))

    init = (jnp.zeros_like(x0_ref[:]), jnp.zeros_like(c1),
            jnp.zeros_like(w1), jnp.zeros_like(c2), jnp.zeros_like(w2))
    dx, dc1, dw1, dc2, dw2 = jax.lax.fori_loop(0, n_steps // window, body,
                                               init, unroll=False)
    dx_ref[:] = dx
    dc1_ref[:] = dc1
    dw1_ref[:] = dw1
    dc2_ref[:] = dc2
    dw2_ref[:] = dw2


def _vmem_kw(itp):
    return {} if itp else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 9, 10, 11))
def fused_rk_multistep_wide(ws: WideSpec, solver: str, dt: float,
                            n_steps: int, x0, c1p, w1p, c2p, w2p,
                            interpret: bool | None = None,
                            lowrank: bool | None = None,
                            bwd_precision: str = "highest"):
    """n_steps whole wide RK steps in ONE kernel launch on a PADDED
    state x0 [K, Ipad]; returns the post-step history [n_steps, K, Ipad]
    (x0 NOT included). Backward is one more launch.

    lowrank: None (auto — low-rank step-Jacobian backward when K == 1,
    the trajectory-mode shape it was built for) | True | False.
    bwd_precision: "highest" (exact-f32 backward) | "bf16" (1-pass MXU
    dots in the backward kernel only; the forward stays exact — see
    _BWD_PRECS for the measured floor this trades against)."""
    check_bwd_precision(bwd_precision)
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    gsm, esm, _ = _wide_consts(ws)
    return pl.pallas_call(
        partial(_wide_multistep_fwd_kernel, ws, tab, dt, needed, n_steps),
        out_shape=jax.ShapeDtypeStruct((n_steps,) + x0.shape, jnp.float32),
        interpret=itp, **_vmem_kw(itp),
    )(x0, c1p, w1p, c2p, w2p, gsm, esm)


def _frmw_fwd(ws, solver, dt, n_steps, x0, c1p, w1p, c2p, w2p, interpret,
              lowrank, bwd_precision):
    ys = fused_rk_multistep_wide(ws, solver, dt, n_steps, x0,
                                 c1p, w1p, c2p, w2p, interpret, lowrank,
                                 bwd_precision)
    return ys, (x0, ys, c1p, w1p, c2p, w2p)


def _frmw_bwd(ws, solver, dt, n_steps, interpret, lowrank, bwd_precision,
              res, gys):
    x0, ys, c1p, w1p, c2p, w2p = res
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    gsm, esm, ssm = _wide_consts(ws)
    window = _bwd_window(n_steps)
    n_live = sum(_needed_stages(tab))
    K = x0.shape[0]
    out_shape = (
        jax.ShapeDtypeStruct(x0.shape, jnp.float32),
        jax.ShapeDtypeStruct(c1p.shape, jnp.float32),
        jax.ShapeDtypeStruct(w1p.shape, jnp.float32),
        jax.ShapeDtypeStruct(c2p.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2p.shape, jnp.float32),
    )
    use_lr = (K == 1) if lowrank is None else lowrank
    if use_lr and K != 1:
        raise ValueError("lowrank backward supports K == 1 only (the "
                         "factors U/V/T are per-trajectory)")
    if use_lr:
        live = [i for i in range(tab.stages) if needed[i]]
        consts = [jnp.asarray(m) for m in
                  _lowrank_batch_consts(ws, tab, dt, live, window)]
        with _prec_ctx(_BWD_PRECS[bwd_precision]):
            dx, dc1, dw1, dc2, dw2 = pl.pallas_call(
                partial(_wide_multistep_bwd_kernel_lr, ws, tab, dt,
                        needed, n_steps, window),
                out_shape=out_shape,
                interpret=itp, **_vmem_kw(itp),
            )(x0, ys, c1p, w1p, c2p, w2p, gsm, esm, *consts, gys)
        return dx, dc1, dw1, dc2, dw2
    with _prec_ctx(_BWD_PRECS[bwd_precision]):
        dx, dc1, dw1, dc2, dw2 = pl.pallas_call(
            partial(_wide_multistep_bwd_kernel, ws, tab, dt, needed,
                    n_steps, window),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((n_live * window * K, ws.H), jnp.float32),
                pltpu.VMEM((n_live * window * K, ws.Opad), jnp.float32),
            ],
            interpret=itp, **_vmem_kw(itp),
        )(x0, ys, c1p, w1p, c2p, w2p, gsm, esm, ssm, gys)
    return dx, dc1, dw1, dc2, dw2


fused_rk_multistep_wide.defvjp(_frmw_fwd, _frmw_bwd)


def wide_chain_adapter(chain, block: int = 128, multistep: bool = True,
                       solver: str = "tsit5",
                       bwd_precision: str = "highest"):
    """Build (ws, advance) for a 2-layer chain with a wide state:
    `advance(params, x_unpadded, dt, n_steps)` runs n_steps fused wide
    RK steps and returns the unpadded final state. multistep=True runs
    the whole chain in ONE kernel launch (fwd) + one (bwd); False scans
    single-step kernels (one launch per step). bwd_precision applies to
    the multistep backward only (see _BWD_PRECS)."""
    from kanodes_tpu.ops.kdense_pallas import chain_spec_of, fused_params

    spec = chain_spec_of(chain)
    if spec.out_dims != spec.in_dims:
        raise ValueError("wide adapter expects in_dims == out_dims")
    ws = WideSpec(spec, block)

    def advance(params, x, dt, n_steps):
        c1, w1, c2, w2 = fused_params(params)
        c1p, w1p, c2p, w2p = ws.pad_params(c1, w1, c2, w2)
        xp = jnp.pad(x, ((0, 0), (0, ws.Ipad - ws.I)))

        if multistep:
            ys = fused_rk_multistep_wide(ws, solver, dt, n_steps, xp,
                                         c1p, w1p, c2p, w2p, None, None,
                                         bwd_precision)
            return ys[-1][:, :ws.I]

        def body(c, _):
            return fused_rk_step_wide(ws, solver, dt, c,
                                      c1p, w1p, c2p, w2p), None

        xp, _ = jax.lax.scan(body, xp, None, length=n_steps)
        return xp[:, :ws.I]

    return ws, advance
