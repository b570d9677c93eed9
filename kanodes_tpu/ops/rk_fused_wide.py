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
                                           _norm, _dnorm, _swish, _dswish)
from kanodes_tpu.ops.rk_fused import _needed_stages, _bwd_window

Array = jax.Array

_PREC = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_PREC)


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
                               precision=_PREC)


def _wide_basis(ws: WideSpec, xn):
    """B [K, G*Ipad]: RBF values against every static grid node,
    concatenated in c1p's row order."""
    inv_h = 1.0 / ws.spec.h
    bs = []
    for gv in ws.grid_values():
        u = (xn - gv) * inv_h
        bs.append(jnp.exp(-(u * u)))
    return jnp.concatenate(bs, axis=1)


def _wide_layer1_fwd(ws: WideSpec, x, c1, w1):
    """Wide-input layer as ONE long-contraction GEMM: x [K, Ipad] ->
    y1 [K, H] via [K, G*Ipad] x [G*Ipad, H] (grid values are static, so
    the basis needs no replication GEMM)."""
    xn = _norm(x, ws.spec.normalizer)
    B = _wide_basis(ws, xn)
    return _dot(_swish(x), w1) + _dot(B, c1)


def _small_layer_fwd(ws: WideSpec, y1, c2, w2, gsm, esm):
    """Narrow-input layer: y1 [K, H] -> y2 [K, Opad]."""
    h = ws.spec.h
    xn = _norm(y1, ws.spec.normalizer)
    rep = _dot(xn, esm)
    u = (rep - gsm) * (1.0 / h)
    basis = jnp.exp(-(u * u))                          # [K, H*G]
    return _dot(basis, c2) + _dot(_swish(y1), w2), u, basis


def _chain_f_wide(ws, x, c1, w1, c2, w2, gsm, esm):
    y1 = _wide_layer1_fwd(ws, x, c1, w1)
    y2, _, _ = _small_layer_fwd(ws, y1, c2, w2, gsm, esm)
    return y2, y1


def _chain_vjp_wide_dx(ws, x, y1, c1, w1, c2, w2, gsm, esm, ssm, gy,
                       B=None):
    """dx-path of the chain VJP. Parameter cotangents are DEFERRED:
    returns (dx, dy1, B, b2) so the caller can batch every stage's
    dc1/dw1/dc2/dw2 into ONE GEMM each per RK step — the per-stage
    param GEMMs are tiny-contraction/tile-latency-bound and dominated
    the backward kernel. Pass the stage's basis `B` from the rebuild
    phase to skip recomputing it."""
    h = ws.spec.h
    # small layer dx-path
    xn2 = _norm(y1, ws.spec.normalizer)
    rep = _dot(xn2, esm)
    u2 = (rep - gsm) * (1.0 / h)
    b2 = jnp.exp(-(u2 * u2))                           # [K, H*G]
    m2 = _dot(gy, c2.T)
    drep = m2 * (-2.0 * u2 * b2) * (1.0 / h)
    dxn2 = _dot(drep, ssm)
    dy1 = dxn2 * _dnorm(y1, ws.spec.normalizer) \
        + _dot(gy, w2.T) * _dswish(y1)
    # wide layer dx-path
    Ipad = ws.Ipad
    inv_h = 1.0 / h
    xn = _norm(x, ws.spec.normalizer)
    if B is None:
        B = _wide_basis(ws, xn)
    m = _dot(dy1, c1.T)                                # [K, G*Ipad]
    dxn = jnp.zeros_like(x)
    for g, gv in enumerate(ws.grid_values()):
        u = (xn - gv) * inv_h
        sl = slice(g * Ipad, (g + 1) * Ipad)
        dxn = dxn + m[:, sl] * (-2.0 * inv_h) * u * B[:, sl]
    dx = dxn * _dnorm(x, ws.spec.normalizer) \
        + _dot(dy1, w1.T) * _dswish(x)
    return dx, dy1, B, b2


def _chain_vjp_wide_dx_pre(ws, x, y1, B, u2, b2, c1, w1, c2, w2, ssm,
                           gy):
    """dx-path of the chain VJP with ALL forward intermediates
    precomputed (B from the wide layer, u2/b2 from the small layer) —
    used by the window-batched multistep backward, where the rebuild
    runs once per window at [W*K, ...] and this per-step chain only
    does the irreducibly sequential work."""
    h = ws.spec.h
    m2 = _dot(gy, c2.T)
    drep = m2 * (-2.0 * u2 * b2) * (1.0 / h)
    dxn2 = _dot(drep, ssm)
    dy1 = dxn2 * _dnorm(y1, ws.spec.normalizer) \
        + _dot(gy, w2.T) * _dswish(y1)
    Ipad = ws.Ipad
    inv_h = 1.0 / h
    xn = _norm(x, ws.spec.normalizer)
    m = _dot(dy1, c1.T)                                # [K, G*Ipad]
    dxn = jnp.zeros_like(x)
    for g, gv in enumerate(ws.grid_values()):
        u = (xn - gv) * inv_h
        sl = slice(g * Ipad, (g + 1) * Ipad)
        dxn = dxn + m[:, sl] * (-2.0 * inv_h) * u * B[:, sl]
    dx = dxn * _dnorm(x, ws.spec.normalizer) \
        + _dot(dy1, w1.T) * _dswish(x)
    return dx, dy1


def _window_rebuild(ws, tab, dt, needed, Xb, c1, w1, c2, w2, gsm, esm):
    """Batched stage rebuild for a whole WINDOW of steps at once: steps
    are independent given their stored input states, so one pass over
    the stages at [W*K, ...] replaces W sequential per-step rebuilds.
    Returns per-stage (xs, y1s, Bs, u2s, b2s) lists (None where the
    stage is pruned)."""
    ks = [None] * tab.stages
    xs = [None] * tab.stages
    y1s = [None] * tab.stages
    Bs = [None] * tab.stages
    u2s = [None] * tab.stages
    b2s = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        xi = Xb
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                xi = xi + (dt * tab.a[i][j]) * ks[j]
        xs[i] = xi
        Bs[i] = _wide_basis(ws, _norm(xi, ws.spec.normalizer))
        y1s[i] = _dot(_swish(xi), w1) + _dot(Bs[i], c1)
        ks[i], u2s[i], b2s[i] = _small_layer_fwd(ws, y1s[i], c2, w2,
                                                 gsm, esm)
    return xs, y1s, Bs, u2s, b2s


def _step_adjoint_wide_collect(ws, tab, dt, needed, x, xbar, c1, w1, c2,
                               w2, gsm, esm, ssm):
    """One-step discrete adjoint at input state x with output cotangent
    xbar — dx-chain only. Parameter cotangents are NOT formed; instead
    the stacked GEMM operands are returned so the caller can batch them
    across stages AND across steps:
      returns (dx, (B [S*K, G*Ipad], b2 [S*K, H*G], D [S*K, H],
                    Kc [S*K, Opad], swx [S*K, Ipad], swy1 [S*K, H]))
    with dc1 = B^T D, dw1 = swx^T D, dc2 = b2^T Kc, dw2 = swy1^T Kc."""
    ks = [None] * tab.stages
    xs = [None] * tab.stages
    y1s = [None] * tab.stages
    Bsaved = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        xi = x
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                xi = xi + (dt * tab.a[i][j]) * ks[j]
        xs[i] = xi
        Bsaved[i] = _wide_basis(ws, _norm(xi, ws.spec.normalizer))
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
            ws, xs[i], y1s[i], c1, w1, c2, w2, gsm, esm, ssm, kbar[i],
            B=Bsaved[i])
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
    ks = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        xi = x
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                xi = xi + (dt * tab.a[i][j]) * ks[j]
        ks[i], _ = _chain_f_wide(ws, xi, c1, w1, c2, w2, gsm, esm)
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

def _wide_one_step(ws, tab, dt, needed, x, c1, w1, c2, w2, gsm, esm):
    ks = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        xi = x
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                xi = xi + (dt * tab.a[i][j]) * ks[j]
        ks[i], _ = _chain_f_wide(ws, xi, c1, w1, c2, w2, gsm, esm)
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

    def body(s, x):
        y = _wide_one_step(ws, tab, dt, needed, x, c1, w1, c2, w2,
                           gsm, esm)
        ys_ref[s] = y
        return y

    jax.lax.fori_loop(0, n_steps, body, x_ref[:], unroll=False)


def _wide_multistep_bwd_kernel(ws, tab, dt, needed, n_steps, window,
                               x0_ref, ys_ref, c1_ref, w1_ref, c2_ref,
                               w2_ref, gsm_ref, esm_ref, ssm_ref, gys_ref,
                               dx_ref, dc1_ref, dw1_ref, dc2_ref, dw2_ref):
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

    def body(wi, carry):
        xbar, dc1, dw1, dc2, dw2 = carry
        # ---- batched rebuild over the window's steps ----
        x_ins = []
        for u in range(window):
            s = n_steps - 1 - (wi * window + u)
            x_ins.append(jnp.where(s == 0, x0_ref[:],
                                   ys_ref[jnp.maximum(s - 1, 0)]))
        Xb = jnp.concatenate(x_ins, axis=0)            # [W*K, Ipad]
        xs, y1s, Bs, u2s, b2s = _window_rebuild(
            ws, tab, dt, needed, Xb, c1, w1, c2, w2, gsm, esm)

        # ---- sequential reverse dx-chain, one step at a time ----
        ops_all = []
        for u in range(window):
            s = n_steps - 1 - (wi * window + u)
            rows = slice(u * K, (u + 1) * K)
            xbar = xbar + gys_ref[s]
            dx = xbar
            kbar = [None] * tab.stages
            for i in range(tab.stages):
                if needed[i] and tab.b[i] != 0.0:
                    kbar[i] = (dt * tab.b[i]) * xbar
            sB, sb2, sD, sK, sswx, sswy1 = [], [], [], [], [], []
            for i in range(tab.stages - 1, -1, -1):
                if not needed[i] or kbar[i] is None:
                    continue
                x_i = xs[i][rows]
                y1_i = y1s[i][rows]
                B_i = Bs[i][rows]
                dxi, dy1_i = _chain_vjp_wide_dx_pre(
                    ws, x_i, y1_i, B_i, u2s[i][rows], b2s[i][rows],
                    c1, w1, c2, w2, ssm, kbar[i])
                sB.append(B_i)
                sb2.append(b2s[i][rows])
                sD.append(dy1_i)
                sK.append(kbar[i])
                sswx.append(_swish(x_i))
                sswy1.append(_swish(y1_i))
                dx = dx + dxi
                for j in range(i):
                    if tab.a[i][j] != 0.0 and needed[j]:
                        contrib = (dt * tab.a[i][j]) * dxi
                        kbar[j] = contrib if kbar[j] is None \
                            else kbar[j] + contrib
            xbar = dx
            ops_all.append((jnp.concatenate(sB, axis=0),
                            jnp.concatenate(sb2, axis=0),
                            jnp.concatenate(sD, axis=0),
                            jnp.concatenate(sK, axis=0),
                            jnp.concatenate(sswx, axis=0),
                            jnp.concatenate(sswy1, axis=0)))
        stacked = tuple(jnp.concatenate([o[i] for o in ops_all], axis=0)
                        for i in range(6))
        dc1i, dw1i, dc2i, dw2i = _param_gemms(stacked)
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


def _vmem_kw(itp):
    return {} if itp else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 9))
def fused_rk_multistep_wide(ws: WideSpec, solver: str, dt: float,
                            n_steps: int, x0, c1p, w1p, c2p, w2p,
                            interpret: bool | None = None):
    """n_steps whole wide RK steps in ONE kernel launch on a PADDED
    state x0 [K, Ipad]; returns the post-step history [n_steps, K, Ipad]
    (x0 NOT included). Backward is one more launch."""
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    gsm, esm, _ = _wide_consts(ws)
    return pl.pallas_call(
        partial(_wide_multistep_fwd_kernel, ws, tab, dt, needed, n_steps),
        out_shape=jax.ShapeDtypeStruct((n_steps,) + x0.shape, jnp.float32),
        interpret=itp, **_vmem_kw(itp),
    )(x0, c1p, w1p, c2p, w2p, gsm, esm)


def _frmw_fwd(ws, solver, dt, n_steps, x0, c1p, w1p, c2p, w2p, interpret):
    ys = fused_rk_multistep_wide(ws, solver, dt, n_steps, x0,
                                 c1p, w1p, c2p, w2p, interpret)
    return ys, (x0, ys, c1p, w1p, c2p, w2p)


def _frmw_bwd(ws, solver, dt, n_steps, interpret, res, gys):
    x0, ys, c1p, w1p, c2p, w2p = res
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    gsm, esm, ssm = _wide_consts(ws)
    dx, dc1, dw1, dc2, dw2 = pl.pallas_call(
        partial(_wide_multistep_bwd_kernel, ws, tab, dt, needed, n_steps,
                _bwd_window(n_steps)),
        out_shape=(
            jax.ShapeDtypeStruct(x0.shape, jnp.float32),
            jax.ShapeDtypeStruct(c1p.shape, jnp.float32),
            jax.ShapeDtypeStruct(w1p.shape, jnp.float32),
            jax.ShapeDtypeStruct(c2p.shape, jnp.float32),
            jax.ShapeDtypeStruct(w2p.shape, jnp.float32),
        ),
        interpret=itp, **_vmem_kw(itp),
    )(x0, ys, c1p, w1p, c2p, w2p, gsm, esm, ssm, gys)
    return dx, dc1, dw1, dc2, dw2


fused_rk_multistep_wide.defvjp(_frmw_fwd, _frmw_bwd)


def wide_chain_adapter(chain, block: int = 128, multistep: bool = True,
                       solver: str = "tsit5"):
    """Build (ws, advance) for a 2-layer chain with a wide state:
    `advance(params, x_unpadded, dt, n_steps)` runs n_steps fused wide
    RK steps and returns the unpadded final state. multistep=True runs
    the whole chain in ONE kernel launch (fwd) + one (bwd); False scans
    single-step kernels (one launch per step)."""
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
                                         c1p, w1p, c2p, w2p)
            return ys[-1][:, :ws.I]

        def body(c, _):
            return fused_rk_step_wide(ws, solver, dt, c,
                                      c1p, w1p, c2p, w2p), None

        xp, _ = jax.lax.scan(body, xp, None, length=n_steps)
        return xp[:, :ws.I]

    return ws, advance
