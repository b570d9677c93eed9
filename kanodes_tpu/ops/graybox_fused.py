"""Fused whole-RK-step kernels for gray-box (hidden-physics) RHSs.

The source-recovery experiments integrate
    du/dt = D * (lap @ u) + phi(u),     phi = pointwise 1->1 KDense
(`Fisher-KPP_Source.jl:95-98`) over 11-101 save points per loss — at
26-41 grid nodes every stage is a tiny GEMV plus a handful of
elementwise ops, so the XLA path is launch-overhead-bound (~37 it/s for
the Allen-Cahn budget). This kernel runs ALL RK stages of a step in one
launch; since the KAN is 1->1 its grid dimension is unrolled as G
scalar-coefficient VPU ops — no basis reshape, no expansion matrix:

    phi(u) = sum_g C[g] * exp(-((norm(u) - z_g)/h)^2) + W * swish(u)

The backward kernel runs the step's discrete adjoint (dC, dW, du); the
known operator's D and lap are static physics, not trained.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from kanodes_tpu.ode.tableaus import get_tableau
from kanodes_tpu.ops.kdense_pallas import (_interpret_default, _norm,
                                           _dnorm, _swish, _dswish,
                                           _PREC, _BWD_PRECS, _prec_ctx,
                                           check_bwd_precision)
from kanodes_tpu.ops.rk_fused import _needed_stages

Array = jax.Array


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_PREC[0])


class GrayboxSpec:
    """Static config: 1->1 KDense (rbf) + symmetric dense operator."""

    def __init__(self, grid_len: int, normalizer: str = "softsign",
                 grid_lims=(-1.0, 1.0), denominator=None):
        self.G = grid_len
        self.normalizer = normalizer
        self.lims = grid_lims
        self.h = denominator if denominator is not None else \
            (grid_lims[1] - grid_lims[0]) / (grid_len - 1)
        self.centers = tuple(np.linspace(grid_lims[0], grid_lims[1],
                                         grid_len).tolist())

    @classmethod
    def of_layer(cls, layer) -> "GrayboxSpec":
        if (layer.in_dims, layer.out_dims) != (1, 1) or \
                layer.basis != "rbf" or not layer.use_base_act:
            raise ValueError("graybox kernel needs a 1->1 rbf KDense")
        return cls(layer.grid_len, layer.normalizer,
                   tuple(float(v) for v in layer.grid_lims),
                   layer.denominator)


def _phi(spec, u, c_ref, w):
    """Pointwise KAN on u [K, N]; c_ref [1, G] in SMEM-ish VMEM row."""
    un = _norm(u, spec.normalizer)
    y = w * _swish(u)
    inv_h = 1.0 / spec.h
    for g in range(spec.G):
        z = (un - spec.centers[g]) * inv_h
        y = y + c_ref[0, g] * jnp.exp(-(z * z))
    return y


def _phi_vjp(spec, u, c_ref, w, gy):
    """Returns (du, dc [G], dw scalar-array [1,1])."""
    un = _norm(u, spec.normalizer)
    inv_h = 1.0 / spec.h
    dun = jnp.zeros_like(u)
    dcs = []
    for g in range(spec.G):
        z = (un - spec.centers[g]) * inv_h
        b = jnp.exp(-(z * z))
        dcs.append(jnp.sum(gy * b))
        dun = dun + c_ref[0, g] * (-2.0 * z * inv_h) * b
    du = gy * dun * _dnorm(u, spec.normalizer) \
        + w * gy * _dswish(u)
    dw = jnp.sum(gy * _swish(u))
    dc = jnp.stack(dcs).reshape(1, spec.G)
    return du, dc, dw


def _known(D, u, lap, kron):
    """The known linear operator. kron=False: u [K, N] row states, one
    [N, N] dense GEMV. kron=True: u is the 2-D field U [n, n] and lap
    the 1-D [n, n] operator L; the Kronecker-sum Laplacian
    (I (+) L) factors as L@U + U@L^T — two tiny MXU dots instead of an
    n^2 x n^2 matrix that would blow the VMEM budget (L symmetric here,
    so L^T = L). Self-adjoint in both modes, so the VJP reuses it."""
    if kron:
        return D * (_dot(lap, u) + _dot(u, lap))
    return D * _dot(u, lap)


def _rhs(spec, D, u, lap, c_ref, w, kron=False):
    return _known(D, u, lap, kron) + _phi(spec, u, c_ref, w)


def _rhs_vjp(spec, D, u, lap, c_ref, w, gy, kron=False):
    du_lin = _known(D, gy, lap, kron)    # operator self-adjoint
    du_phi, dc, dw = _phi_vjp(spec, u, c_ref, w, gy)
    return du_lin + du_phi, dc, dw


def _gb_fwd_kernel(spec, tab, dt, D, needed, kron,
                   u_ref, lap_ref, c_ref, w_ref, y_ref):
    u = u_ref[:]
    lap = lap_ref[:]
    w = w_ref[0, 0]
    ks = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        ui = u
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                ui = ui + (dt * tab.a[i][j]) * ks[j]
        ks[i] = _rhs(spec, D, ui, lap, c_ref, w, kron)
    y = u
    for i in range(tab.stages):
        if tab.b[i] != 0.0:
            y = y + (dt * tab.b[i]) * ks[i]
    y_ref[:] = y


def _gb_bwd_kernel(spec, tab, dt, D, needed, kron,
                   u_ref, lap_ref, c_ref, w_ref, gy_ref,
                   du_ref, dc_ref, dw_ref):
    u = u_ref[:]
    lap = lap_ref[:]
    w = w_ref[0, 0]
    gy = gy_ref[:]

    ks = [None] * tab.stages
    us = [None] * tab.stages
    for i in range(tab.stages):
        if not needed[i]:
            continue
        ui = u
        for j in range(i):
            if tab.a[i][j] != 0.0 and ks[j] is not None:
                ui = ui + (dt * tab.a[i][j]) * ks[j]
        us[i] = ui
        ks[i] = _rhs(spec, D, ui, lap, c_ref, w, kron)

    ubar = gy
    kbar = [None] * tab.stages
    for i in range(tab.stages):
        if needed[i] and tab.b[i] != 0.0:
            kbar[i] = (dt * tab.b[i]) * gy
    dc = jnp.zeros((1, spec.G), jnp.float32)
    dw = jnp.zeros((), jnp.float32)  # scalar accumulator (reshaped at store)
    for i in range(tab.stages - 1, -1, -1):
        if not needed[i] or kbar[i] is None:
            continue
        dui, dci, dwi = _rhs_vjp(spec, D, us[i], lap, c_ref, w, kbar[i],
                                 kron)
        ubar = ubar + dui
        dc = dc + dci
        dw = dw + dwi
        for j in range(i):
            if tab.a[i][j] != 0.0 and needed[j]:
                contrib = (dt * tab.a[i][j]) * dui
                kbar[j] = contrib if kbar[j] is None else kbar[j] + contrib

    du_ref[:] = ubar
    dc_ref[:] = dc
    dw_ref[:] = dw.reshape(1, 1)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 8, 9, 10))
def fused_graybox_rk_step(spec: GrayboxSpec, solver: str, dt: float,
                          D: float, u, lap, c, w,
                          interpret: bool | None = None,
                          bwd_precision: str = "highest",
                          kron: bool = False):
    """One whole RK step of du/dt = D*lap@u + phi(u) as ONE kernel.

    u: [K, N]; lap: [N, N] SYMMETRIC dense operator; c: [1, G] KAN
    spline coefficients; w: [1, 1] residual weight. kron=True instead
    takes the 2-D field u=[n, n] with lap=[n, n] the 1-D operator and
    applies the Kronecker-sum Laplacian as L@U + U@L (see `_known`). Differentiable
    w.r.t. u, c, w (D and lap are known physics). bwd_precision:
    "highest" (exact-f32 backward dots) | "bf16" (1-pass MXU dots in
    the backward kernel only; forward stays exact f32).
    """
    check_bwd_precision(bwd_precision)
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    return pl.pallas_call(
        partial(_gb_fwd_kernel, spec, tab, dt, D, needed, kron),
        out_shape=jax.ShapeDtypeStruct(u.shape, jnp.float32),
        interpret=itp,
    )(u, lap, c, w)


def _fgb_fwd(spec, solver, dt, D, u, lap, c, w, interpret, bwd_precision,
             kron):
    y = fused_graybox_rk_step(spec, solver, dt, D, u, lap, c, w, interpret,
                              bwd_precision, kron)
    return y, (u, lap, c, w)


def _fgb_bwd(spec, solver, dt, D, interpret, bwd_precision, kron, res, gy):
    u, lap, c, w = res
    tab = get_tableau(solver)
    needed = tuple(_needed_stages(tab))
    itp = _interpret_default() if interpret is None else interpret
    with _prec_ctx(_BWD_PRECS[bwd_precision]):
        du, dc, dw = pl.pallas_call(
            partial(_gb_bwd_kernel, spec, tab, dt, D, needed, kron),
            out_shape=(
                jax.ShapeDtypeStruct(u.shape, jnp.float32),
                jax.ShapeDtypeStruct(c.shape, jnp.float32),
                jax.ShapeDtypeStruct(w.shape, jnp.float32),
            ),
            interpret=itp,
        )(u, lap, c, w, gy)
    return du, jnp.zeros_like(lap), dc, dw


fused_graybox_rk_step.defvjp(_fgb_fwd, _fgb_bwd)


def graybox_kernel_adapter(layer, lap: Array, D: float,
                           bwd_precision: str = "highest"):
    """Build advance(params, u [N], dt, n_steps) -> [n_steps+1, N] for a
    1->1 KDense gray-box RHS; params is the layer's {C, W} dict."""
    spec = GrayboxSpec.of_layer(layer)
    lap = jnp.asarray(lap, jnp.float32)

    def advance(params, u, dt, n_steps):
        c = params["C"].reshape(1, spec.G)
        w = params["W"].reshape(1, 1)
        x = u[None, :]

        def body(carr, _):
            y = fused_graybox_rk_step(spec, "tsit5", dt, D, carr, lap,
                                      c, w, None, bwd_precision)
            return y, y

        _, ys = jax.lax.scan(body, x, None, length=n_steps)
        return jnp.concatenate([x[None], ys], axis=0)[:, 0, :]

    return spec, advance


def graybox_kron_kernel_adapter(layer, lap1: Array, D: float,
                                bwd_precision: str = "highest"):
    """Build advance(params, U [n, n], dt, n_steps) -> [n_steps+1, n, n]
    for the 2-D gray-box RHS D*lap2d(U) + phi.(U), with the Kronecker-sum
    Laplacian factored inside the kernel as L@U + U@L (`_known`) —
    VMEM-light (one [n, n] operator) where the flattened [n^2, n^2]
    dense form blows the 16 MB scoped budget at n=32."""
    spec = GrayboxSpec.of_layer(layer)
    lap1 = jnp.asarray(lap1, jnp.float32)

    def advance(params, U, dt, n_steps):
        c = params["C"].reshape(1, spec.G)
        w = params["W"].reshape(1, 1)

        def body(carr, _):
            y = fused_graybox_rk_step(spec, "tsit5", dt, D, carr, lap1,
                                      c, w, None, bwd_precision, True)
            return y, y

        _, ys = jax.lax.scan(body, U, None, length=n_steps)
        return jnp.concatenate([U[None], ys], axis=0)

    return spec, advance
