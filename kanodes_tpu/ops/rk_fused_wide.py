"""Wide-state fused RK-step kernels (blocked over the input dimension).

The standard fused kernels (`ops/rk_fused.py`) materialize an
O(I^2 G) expansion matrix — fine for I <= ~40, but the Schrödinger
surrogate's 402-dim state needs 44 MB of VMEM scratch (measured compile
failure). This variant blocks the WIDE layer over its input dimension in
chunks of `BI` lanes: the expansion/collapse matrices shrink to
[BI, BI*G] (shared across blocks — the basis layout is block-diagonal
per input), and the per-block GEMMs accumulate into the layer output.

Shapes (chain [I -> H -> I], I wide, H small):
  * I is padded to a multiple of BI; the padded rows of C1/W1 and padded
    COLUMNS of C2/W2 are zero, so padded lanes contribute nothing and
    their cotangents are discarded;
  * layer 1 (wide in): blocked basis expansion + accumulated GEMMs;
  * layer 2 (wide out): ordinary GEMMs — a wide OUTPUT needs no blocking.

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
from kanodes_tpu.ops.rk_fused import _needed_stages

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
    def grid_block(self) -> np.ndarray:
        g = np.linspace(self.spec.grid_lims[0], self.spec.grid_lims[1],
                        self.G, dtype=np.float32)
        return np.tile(g, self.block)[None, :]        # [1, BI*G]

    def grid_small(self, n: int) -> np.ndarray:
        g = np.linspace(self.spec.grid_lims[0], self.spec.grid_lims[1],
                        self.G, dtype=np.float32)
        return np.tile(g, n)[None, :]

    def expand_block(self) -> np.ndarray:
        e = np.zeros((self.block, self.block * self.G), np.float32)
        for i in range(self.block):
            e[i, i * self.G:(i + 1) * self.G] = 1.0
        return e

    def collapse_block(self) -> np.ndarray:
        return self.expand_block().T.copy()

    def expand_small(self, n: int) -> np.ndarray:
        e = np.zeros((n, n * self.G), np.float32)
        for i in range(n):
            e[i, i * self.G:(i + 1) * self.G] = 1.0
        return e

    def collapse_small(self, n: int) -> np.ndarray:
        return self.expand_small(n).T.copy()

    # parameter padding -----------------------------------------------------
    def pad_params(self, c1, w1, c2, w2):
        """c1 [I*G, H] -> [Ipad*G, H] (zero rows); w1 [I, H] -> [Ipad, H];
        c2 [H*G, O] -> [H*G, Opad]; w2 [H, O] -> [H, Opad]."""
        pad_i = self.Ipad - self.I
        c1p = jnp.pad(c1.reshape(self.I, self.G, self.H),
                      ((0, pad_i), (0, 0), (0, 0))).reshape(
                          self.Ipad * self.G, self.H)
        w1p = jnp.pad(w1, ((0, pad_i), (0, 0)))
        pad_o = self.Opad - self.O
        c2p = jnp.pad(c2, ((0, 0), (0, pad_o)))
        w2p = jnp.pad(w2, ((0, 0), (0, pad_o)))
        return c1p, w1p, c2p, w2p


def _wide_layer1_fwd(ws: WideSpec, x, c1, w1, gblk, eblk):
    """Blocked wide-input layer: x [K, Ipad] -> y1 [K, H]."""
    h = ws.spec.h
    BI, G = ws.block, ws.G
    y1 = jnp.zeros((x.shape[0], ws.H), jnp.float32)
    for b in range(ws.nb):
        xb = x[:, b * BI:(b + 1) * BI]
        xnb = _norm(xb, ws.spec.normalizer)
        rep = _dot(xnb, eblk)
        u = (rep - gblk) * (1.0 / h)
        basis = jnp.exp(-(u * u))                      # [K, BI*G]
        c1b = c1[b * BI * G:(b + 1) * BI * G, :]
        w1b = w1[b * BI:(b + 1) * BI, :]
        y1 = y1 + _dot(basis, c1b) + _dot(_swish(xb), w1b)
    return y1


def _wide_layer1_bwd(ws: WideSpec, x, c1, w1, gblk, eblk, sblk, gy1):
    """Returns (dx [K, Ipad], dc1, dw1)."""
    h = ws.spec.h
    BI, G = ws.block, ws.G
    dx_blocks = []
    dc1_blocks = []
    dw1_blocks = []
    for b in range(ws.nb):
        xb = x[:, b * BI:(b + 1) * BI]
        xnb = _norm(xb, ws.spec.normalizer)
        rep = _dot(xnb, eblk)
        u = (rep - gblk) * (1.0 / h)
        basis = jnp.exp(-(u * u))
        c1b = c1[b * BI * G:(b + 1) * BI * G, :]
        w1b = w1[b * BI:(b + 1) * BI, :]
        dc1_blocks.append(_dot(basis.T, gy1))
        dw1_blocks.append(_dot(_swish(xb).T, gy1))
        m = _dot(gy1, c1b.T)
        drep = m * (-2.0 * u * basis) * (1.0 / h)
        dxn = _dot(drep, sblk)
        dxb = dxn * _dnorm(xb, ws.spec.normalizer) \
            + _dot(gy1, w1b.T) * _dswish(xb)
        dx_blocks.append(dxb)
    dx = jnp.concatenate(dx_blocks, axis=1)
    dc1 = jnp.concatenate(dc1_blocks, axis=0)
    dw1 = jnp.concatenate(dw1_blocks, axis=0)
    return dx, dc1, dw1


def _small_layer_fwd(ws: WideSpec, y1, c2, w2, gsm, esm):
    """Narrow-input layer: y1 [K, H] -> y2 [K, Opad]."""
    h = ws.spec.h
    xn = _norm(y1, ws.spec.normalizer)
    rep = _dot(xn, esm)
    u = (rep - gsm) * (1.0 / h)
    basis = jnp.exp(-(u * u))                          # [K, H*G]
    return _dot(basis, c2) + _dot(_swish(y1), w2), u, basis


def _small_layer_bwd(ws: WideSpec, y1, c2, w2, gsm, esm, ssm, u, basis,
                     gy2):
    h = ws.spec.h
    dc2 = _dot(basis.T, gy2)
    dw2 = _dot(_swish(y1).T, gy2)
    m = _dot(gy2, c2.T)
    drep = m * (-2.0 * u * basis) * (1.0 / h)
    dxn = _dot(drep, ssm)
    dy1 = dxn * _dnorm(y1, ws.spec.normalizer) \
        + _dot(gy2, w2.T) * _dswish(y1)
    return dy1, dc2, dw2


def _chain_f_wide(ws, x, c1, w1, c2, w2, gblk, eblk, gsm, esm):
    y1 = _wide_layer1_fwd(ws, x, c1, w1, gblk, eblk)
    y2, _, _ = _small_layer_fwd(ws, y1, c2, w2, gsm, esm)
    return y2, y1


def _chain_vjp_wide(ws, x, y1, c1, w1, c2, w2, gblk, eblk, sblk,
                    gsm, esm, ssm, gy):
    _, u2, b2 = _small_layer_fwd(ws, y1, c2, w2, gsm, esm)
    dy1, dc2, dw2 = _small_layer_bwd(ws, y1, c2, w2, gsm, esm, ssm,
                                     u2, b2, gy)
    dx, dc1, dw1 = _wide_layer1_bwd(ws, x, c1, w1, gblk, eblk, sblk, dy1)
    return dx, dc1, dw1, dc2, dw2


def _wide_step_fwd_kernel(ws, tab, dt, needed,
                          x_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                          gblk_ref, eblk_ref, gsm_ref, esm_ref, y_ref):
    x = x_ref[:]
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    gblk, eblk = gblk_ref[:], eblk_ref[:]
    gsm, esm = gsm_ref[:], esm_ref[:]
    ks = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        xi = x
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                xi = xi + (dt * tab.a[i][j]) * ks[j]
        ks[i], _ = _chain_f_wide(ws, xi, c1, w1, c2, w2, gblk, eblk,
                                 gsm, esm)
    y = x
    for i in range(tab.stages):
        if tab.b[i] != 0.0:
            y = y + (dt * tab.b[i]) * ks[i]
    y_ref[:] = y


def _wide_step_bwd_kernel(ws, tab, dt, needed,
                          x_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                          gblk_ref, eblk_ref, sblk_ref, gsm_ref, esm_ref,
                          ssm_ref, gy_ref,
                          dx_ref, dc1_ref, dw1_ref, dc2_ref, dw2_ref):
    x = x_ref[:]
    c1, w1, c2, w2 = c1_ref[:], w1_ref[:], c2_ref[:], w2_ref[:]
    gblk, eblk, sblk = gblk_ref[:], eblk_ref[:], sblk_ref[:]
    gsm, esm, ssm = gsm_ref[:], esm_ref[:], ssm_ref[:]
    gy = gy_ref[:]

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
        ks[i], y1s[i] = _chain_f_wide(ws, xi, c1, w1, c2, w2, gblk, eblk,
                                      gsm, esm)

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
        dxi, dc1i, dw1i, dc2i, dw2i = _chain_vjp_wide(
            ws, xs[i], y1s[i], c1, w1, c2, w2, gblk, eblk, sblk,
            gsm, esm, ssm, kbar[i])
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


def _wide_consts(ws: WideSpec):
    return (jnp.asarray(ws.grid_block()), jnp.asarray(ws.expand_block()),
            jnp.asarray(ws.collapse_block()),
            jnp.asarray(ws.grid_small(ws.H)),
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
    gblk, eblk, _, gsm, esm, _ = _wide_consts(ws)
    kw = {} if itp else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}
    return pl.pallas_call(
        partial(_wide_step_fwd_kernel, ws, tab, dt, needed),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=itp, **kw,
    )(x, c1p, w1p, c2p, w2p, gblk, eblk, gsm, esm)


def _frsw_fwd(ws, solver, dt, x, c1p, w1p, c2p, w2p, interpret):
    y = fused_rk_step_wide(ws, solver, dt, x, c1p, w1p, c2p, w2p,
                           interpret)
    return y, (x, c1p, w1p, c2p, w2p)


def _frsw_bwd(ws, solver, dt, interpret, res, gy):
    x, c1p, w1p, c2p, w2p = res
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    gblk, eblk, sblk, gsm, esm, ssm = _wide_consts(ws)
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
    )(x, c1p, w1p, c2p, w2p, gblk, eblk, sblk, gsm, esm, ssm, gy)
    return dx, dc1, dw1, dc2, dw2


fused_rk_step_wide.defvjp(_frsw_fwd, _frsw_bwd)


def wide_chain_adapter(chain, block: int = 128):
    """Build (ws, to_padded, advance) for a 2-layer chain with a wide
    state: `advance(params, x_unpadded, dt, n_steps)` runs n_steps fused
    wide RK steps and returns the unpadded state."""
    from kanodes_tpu.ops.kdense_pallas import chain_spec_of, fused_params

    spec = chain_spec_of(chain)
    if spec.out_dims != spec.in_dims:
        raise ValueError("wide adapter expects in_dims == out_dims")
    ws = WideSpec(spec, block)

    def advance(params, x, dt, n_steps):
        c1, w1, c2, w2 = fused_params(params)
        c1p, w1p, c2p, w2p = ws.pad_params(c1, w1, c2, w2)
        xp = jnp.pad(x, ((0, 0), (0, ws.Ipad - ws.I)))

        def body(c, _):
            return fused_rk_step_wide(ws, "tsit5", dt, c,
                                      c1p, w1p, c2p, w2p), None

        xp, _ = jax.lax.scan(body, xp, None, length=n_steps)
        return xp[:, :ws.I]

    return ws, advance
