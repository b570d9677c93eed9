"""Fused Pallas TPU kernels for the KDense KAN chain.

The hot op of every experiment is the KAN-chain RHS evaluated inside an
RK stage (SURVEY.md §3.1): per layer, a basis expansion followed by a
GEMM plus a residual GEMM. As separate XLA ops on the tiny shapes of
this workload (state dim 2-402) each RK stage costs ~16 kernel
dispatches; fusing the whole 2-layer chain into ONE Pallas kernel (and
its whole backward into one more) removes that fixed overhead, which —
not FLOPs — is the bottleneck at these sizes.

Layout notes:
  * everything lives in VMEM (layer params are O(KB));
  * the [K, I, G] basis tensor is kept 2-D as [K, I*G] (i-major, g-minor)
    so both the expansion and the contraction are rank-2 ops; the
    per-input collapse in the backward pass is a GEMM against a constant
    block-indicator matrix — MXU-friendly, no gather/scatter;
  * only the default configuration (rbf basis, tanh normalizer, swish
    base act — the settings of every reference experiment) is fused;
    other configs fall back to the XLA path in `models/kdense.py`.

Reference semantics being fused: `kdense.jl:109-130` (two stacked
layers, `LV_driver_KANODE.jl:136-142`) and the rbf VJP `utils.jl:15-21`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

Array = jax.Array

# Shared kernel dot-precision holder (1-elem list so every kernel
# module sees the same mutable cell). HIGHEST = exact f32 via 6-pass
# MXU emulation; the backward kernels can be dropped to 1-pass bf16
# per call (see fused_rk_multistep*'s bwd_precision) — the measured
# trajectory-mode floor is this pass count (ops/rk_fused_wide).
_PREC = [jax.lax.Precision.HIGHEST]

_BWD_PRECS = {
    "highest": jax.lax.Precision.HIGHEST,   # exact f32 (6 MXU passes)
    "bf16": jax.lax.Precision.DEFAULT,      # 1 MXU pass
}


def check_bwd_precision(bwd_precision: str) -> str:
    """Fail fast at call time: an invalid option would otherwise only
    surface as an opaque KeyError when the backward first traces."""
    if bwd_precision not in _BWD_PRECS:
        raise ValueError(
            f"bwd_precision must be one of {sorted(_BWD_PRECS)}, "
            f"got {bwd_precision!r}")
    return bwd_precision


class _prec_ctx:
    """Trace-time dot-precision override for backward kernels (kernel
    bodies read _PREC[0] while pallas_call traces them, synchronously,
    inside this context)."""

    def __init__(self, p):
        self.p = p

    def __enter__(self):
        self.old = _PREC[0]
        _PREC[0] = self.p

    def __exit__(self, *exc):
        _PREC[0] = self.old



def _interpret_default() -> bool:
    # Pallas TPU kernels need a TPU; interpret elsewhere (tests on CPU).
    return jax.default_backend() != "tpu"


@dataclasses.dataclass(frozen=True)
class ChainSpec:
    """Static description of a 2-layer KDense chain (rbf basis, swish
    base act, tanh or softsign normalizer)."""
    in_dims: int
    hidden: int
    out_dims: int
    grid_len: int
    grid_lims: tuple[float, float] = (-1.0, 1.0)
    denominator: float | None = None
    normalizer: str = "tanh"
    basis: str = "rbf"                 # rbf | iqf | rswaf (local bases)

    @property
    def h(self) -> float:
        if self.denominator is not None:
            return self.denominator
        return (self.grid_lims[1] - self.grid_lims[0]) / (self.grid_len - 1)

    def grid_flat(self, n_inputs: int) -> np.ndarray:
        g = np.linspace(self.grid_lims[0], self.grid_lims[1], self.grid_len,
                        dtype=np.float32)
        return np.tile(g, n_inputs)[None, :]          # [1, n*G]

    def collapse(self, n_inputs: int) -> np.ndarray:
        """Block indicator S: [n*G, n], S[i*G+g, i] = 1 (sum over G)."""
        s = np.zeros((n_inputs * self.grid_len, n_inputs), dtype=np.float32)
        for i in range(n_inputs):
            s[i * self.grid_len:(i + 1) * self.grid_len, i] = 1.0
        return s

    def expand(self, n_inputs: int) -> np.ndarray:
        """Column expansion E = S.T: xn @ E replicates each input column
        G times (i-major, g-minor). A constant 0/1 GEMM instead of a
        broadcast+reshape — Mosaic cannot lower minor-dim shape casts on
        sub-tile shapes, and the MXU eats this for free."""
        return self.collapse(n_inputs).T.copy()


def _norm(x, kind: str):
    if kind == "tanh":
        return jnp.tanh(x)
    if kind == "softsign":
        return x / (1.0 + jnp.abs(x))
    raise ValueError(kind)


def _dnorm(x, kind: str):
    if kind == "tanh":
        t = jnp.tanh(x)
        return 1.0 - t * t
    if kind == "softsign":
        d = 1.0 + jnp.abs(x)
        return 1.0 / (d * d)
    raise ValueError(kind)


def _basis_val(u, kind: str):
    """Radial basis value B(u) on the normalized distance u — the three
    local bases of `ops/basis.py` (utils.jl:8-62); global bases (cheby/
    fourier) are XLA-path only."""
    if kind == "rbf":
        return jnp.exp(-(u * u))
    if kind == "iqf":
        return 1.0 / (1.0 + u * u)
    if kind == "rswaf":
        t = jnp.tanh(u)
        return 1.0 - t * t
    raise ValueError(kind)


def _basis_du(u, B, kind: str):
    """dB/du given the already-computed B (cheap forms for each basis)."""
    if kind == "rbf":
        return -2.0 * u * B
    if kind == "iqf":
        return -2.0 * u * B * B
    if kind == "rswaf":
        return -2.0 * jnp.tanh(u) * B
    raise ValueError(kind)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _dswish(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _layer_fwd(x, c, w, gflat, h, expand, normalizer="tanh",
               basis_kind="rbf"):
    """One KDense layer on 2-D blocks: x[K,I], c[I*G,O], w[I,O],
    gflat[1,I*G], expand[I,I*G]. Returns (y, u, basis)."""
    xn = _norm(x, normalizer)
    xn_rep = jnp.dot(xn, expand, preferred_element_type=jnp.float32,
                precision=_PREC[0])
    u = (xn_rep - gflat) * (1.0 / h)
    basis = _basis_val(u, basis_kind)                  # [K, I*G]
    y = jnp.dot(basis, c, preferred_element_type=jnp.float32,
                precision=_PREC[0]) \
        + jnp.dot(_swish(x), w, preferred_element_type=jnp.float32,
                precision=_PREC[0])
    return y, u, basis


def _layer_bwd(x, c, w, gflat, h, u, basis, gy, collapse,
               normalizer="tanh", basis_kind="rbf"):
    """Backward of one layer. gy: [K, O]. Returns (dx, dc, dw)."""
    dc = jnp.dot(basis.T, gy, preferred_element_type=jnp.float32,
                precision=_PREC[0])
    dw = jnp.dot(_swish(x).T, gy, preferred_element_type=jnp.float32,
                precision=_PREC[0])
    # spline path: dbasis = gy @ c.T ; du = dB/du ; dxn_rep = du / h
    m = jnp.dot(gy, c.T, preferred_element_type=jnp.float32,
                precision=_PREC[0])   # [K, I*G]
    dxn_rep = m * _basis_du(u, basis, basis_kind) * (1.0 / h)
    dxn = jnp.dot(dxn_rep, collapse,
                  preferred_element_type=jnp.float32,
                precision=_PREC[0])           # [K, I]
    dx = dxn * _dnorm(x, normalizer) + jnp.dot(
        gy, w.T, preferred_element_type=jnp.float32,
                precision=_PREC[0]) * _dswish(x)
    return dx, dc, dw


# ---------------------------------------------------------------------------
# fused 2-layer chain kernels
# ---------------------------------------------------------------------------

def _chain_fwd_kernel(spec, x_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                      g1_ref, g2_ref, e1_ref, e2_ref, y_ref, y1_ref):
    y1, _, _ = _layer_fwd(x_ref[:], c1_ref[:], w1_ref[:], g1_ref[:], spec.h,
                          e1_ref[:], spec.normalizer, spec.basis)
    y2, _, _ = _layer_fwd(y1, c2_ref[:], w2_ref[:], g2_ref[:], spec.h,
                          e2_ref[:], spec.normalizer, spec.basis)
    y_ref[:] = y2
    y1_ref[:] = y1


def _chain_bwd_kernel(spec, x_ref, y1_ref, c1_ref, w1_ref, c2_ref, w2_ref,
                      g1_ref, g2_ref, e1_ref, e2_ref, s1_ref, s2_ref, gy_ref,
                      dx_ref, dc1_ref, dw1_ref, dc2_ref, dw2_ref):
    x, y1, gy = x_ref[:], y1_ref[:], gy_ref[:]
    # recompute cheap forward intermediates (basis tensors)
    _, u2, b2 = _layer_fwd(y1, c2_ref[:], w2_ref[:], g2_ref[:], spec.h,
                           e2_ref[:], spec.normalizer, spec.basis)
    dy1, dc2, dw2 = _layer_bwd(y1, c2_ref[:], w2_ref[:], g2_ref[:], spec.h,
                               u2, b2, gy, s2_ref[:], spec.normalizer, spec.basis)
    _, u1, b1 = _layer_fwd(x, c1_ref[:], w1_ref[:], g1_ref[:], spec.h,
                           e1_ref[:], spec.normalizer, spec.basis)
    dx, dc1, dw1 = _layer_bwd(x, c1_ref[:], w1_ref[:], g1_ref[:], spec.h,
                              u1, b1, dy1, s1_ref[:], spec.normalizer, spec.basis)
    dx_ref[:] = dx
    dc1_ref[:] = dc1
    dw1_ref[:] = dw1
    dc2_ref[:] = dc2
    dw2_ref[:] = dw2


def _fwd_call(spec: ChainSpec, x, c1, w1, c2, w2, interpret):
    K = x.shape[0]
    g1 = jnp.asarray(spec.grid_flat(spec.in_dims))
    g2 = jnp.asarray(spec.grid_flat(spec.hidden))
    e1 = jnp.asarray(spec.expand(spec.in_dims))
    e2 = jnp.asarray(spec.expand(spec.hidden))
    return pl.pallas_call(
        partial(_chain_fwd_kernel, spec),
        out_shape=(
            jax.ShapeDtypeStruct((K, spec.out_dims), jnp.float32),
            jax.ShapeDtypeStruct((K, spec.hidden), jnp.float32),
        ),
        interpret=interpret,
    )(x, c1, w1, c2, w2, g1, g2, e1, e2)


def _bwd_call(spec: ChainSpec, x, y1, c1, w1, c2, w2, gy, interpret):
    K = x.shape[0]
    g1 = jnp.asarray(spec.grid_flat(spec.in_dims))
    g2 = jnp.asarray(spec.grid_flat(spec.hidden))
    e1 = jnp.asarray(spec.expand(spec.in_dims))
    e2 = jnp.asarray(spec.expand(spec.hidden))
    s1 = jnp.asarray(spec.collapse(spec.in_dims))
    s2 = jnp.asarray(spec.collapse(spec.hidden))
    return pl.pallas_call(
        partial(_chain_bwd_kernel, spec),
        out_shape=(
            jax.ShapeDtypeStruct((K, spec.in_dims), jnp.float32),
            jax.ShapeDtypeStruct(c1.shape, jnp.float32),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct(c2.shape, jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        ),
        interpret=interpret,
    )(x, y1, c1, w1, c2, w2, g1, g2, e1, e2, s1, s2, gy)


@partial(jax.custom_vjp, nondiff_argnums=(0, 6))
def kan_chain_apply(spec: ChainSpec, x, c1, w1, c2, w2,
                    interpret: bool | None = None):
    """Fused 2-layer KDense chain: x[K, I] -> [K, O].

    c1: [I*G, H], w1: [I, H], c2: [H*G, O], w2: [H, O] (2-D, i-major
    g-minor rows — `KDense` params C[I, G, O] reshape to this for free).
    """
    interpret = _interpret_default() if interpret is None else interpret
    y, _ = _fwd_call(spec, x, c1, w1, c2, w2, interpret)
    return y


def _kca_fwd(spec, x, c1, w1, c2, w2, interpret):
    interpret = _interpret_default() if interpret is None else interpret
    y, y1 = _fwd_call(spec, x, c1, w1, c2, w2, interpret)
    return y, (x, y1, c1, w1, c2, w2)


def _kca_bwd(spec, interpret, res, gy):
    interpret_ = _interpret_default() if interpret is None else interpret
    x, y1, c1, w1, c2, w2 = res
    dx, dc1, dw1, dc2, dw2 = _bwd_call(spec, x, y1, c1, w1, c2, w2, gy,
                                       interpret_)
    return dx, dc1, dw1, dc2, dw2


kan_chain_apply.defvjp(_kca_fwd, _kca_bwd)


# ---------------------------------------------------------------------------
# adapter: KANChain params -> fused call
# ---------------------------------------------------------------------------

def chain_spec_of(chain) -> ChainSpec:
    """Build a ChainSpec from a 2-layer KANChain (validates fusability)."""
    if len(chain.layers) != 2:
        raise ValueError("fused path supports exactly 2 layers")
    l1, l2 = chain.layers
    for l in (l1, l2):
        if l.basis not in ("rbf", "iqf", "rswaf") or \
                (l.base_act, l.use_base_act) != ("swish", True) or \
                l.normalizer not in ("tanh", "softsign"):
            raise ValueError("fused path requires a local basis "
                             "(rbf/iqf/rswaf), swish base act, and a "
                             "tanh/softsign normalizer")
        if l.grid_len != l1.grid_len or l.grid_lims != l1.grid_lims \
                or l.normalizer != l1.normalizer or l.basis != l1.basis:
            raise ValueError("fused path requires shared "
                             "grid/normalizer/basis")
    return ChainSpec(l1.in_dims, l1.out_dims, l2.out_dims, l1.grid_len,
                     tuple(float(v) for v in l1.grid_lims),
                     l1.denominator, l1.normalizer, l1.basis)


def fused_params(chain_params) -> tuple[Array, Array, Array, Array]:
    p1, p2 = chain_params
    c1 = p1["C"].reshape(-1, p1["C"].shape[-1])
    c2 = p2["C"].reshape(-1, p2["C"].shape[-1])
    return c1, p1["W"], c2, p2["W"]


# ---------------------------------------------------------------------------
# single-layer fused kernel (KDense.apply(..., impl="pallas"))
# ---------------------------------------------------------------------------

def _single_fwd_kernel(h, normalizer, x_ref, c_ref, w_ref, g_ref, e_ref,
                       y_ref):
    y, _, _ = _layer_fwd(x_ref[:], c_ref[:], w_ref[:], g_ref[:], h,
                         e_ref[:], normalizer)
    y_ref[:] = y


def _single_bwd_kernel(h, normalizer, x_ref, c_ref, w_ref, g_ref, e_ref,
                       s_ref, gy_ref, dx_ref, dc_ref, dw_ref):
    x, gy = x_ref[:], gy_ref[:]
    _, u, b = _layer_fwd(x, c_ref[:], w_ref[:], g_ref[:], h, e_ref[:],
                         normalizer)
    dx, dc, dw = _layer_bwd(x, c_ref[:], w_ref[:], g_ref[:], h, u, b, gy,
                            s_ref[:], normalizer)
    dx_ref[:] = dx
    dc_ref[:] = dc
    dw_ref[:] = dw


@partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def kdense_single_apply(spec: ChainSpec, x, c, w,
                        interpret: bool | None = None):
    """Fused single KDense layer: x[K, I] -> [K, O] with c[I*G, O],
    w[I, O]. `spec.hidden` is the layer's out_dims here."""
    interpret = _interpret_default() if interpret is None else interpret
    g = jnp.asarray(spec.grid_flat(spec.in_dims))
    e = jnp.asarray(spec.expand(spec.in_dims))
    return pl.pallas_call(
        partial(_single_fwd_kernel, spec.h, spec.normalizer),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], c.shape[1]),
                                       jnp.float32),
        interpret=interpret,
    )(x, c, w, g, e)


def _ksa_fwd(spec, x, c, w, interpret):
    y = kdense_single_apply(spec, x, c, w, interpret)
    return y, (x, c, w)


def _ksa_bwd(spec, interpret, res, gy):
    interpret_ = _interpret_default() if interpret is None else interpret
    x, c, w = res
    g = jnp.asarray(spec.grid_flat(spec.in_dims))
    e = jnp.asarray(spec.expand(spec.in_dims))
    s = jnp.asarray(spec.collapse(spec.in_dims))
    dx, dc, dw = pl.pallas_call(
        partial(_single_bwd_kernel, spec.h, spec.normalizer),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct(c.shape, jnp.float32),
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
        ),
        interpret=interpret_,
    )(x, c, w, g, e, s, gy)
    return dx, dc, dw


kdense_single_apply.defvjp(_ksa_fwd, _ksa_bwd)


def kdense_pallas(layer, params, x):
    """Dispatch target for `KDense.apply(..., impl="pallas")`."""
    if (layer.basis, layer.base_act, layer.use_base_act) != \
            ("rbf", "swish", True) or \
            layer.normalizer not in ("tanh", "softsign"):
        raise ValueError("fused path requires rbf basis, swish base act, "
                         "and a tanh/softsign normalizer")
    spec = ChainSpec(layer.in_dims, layer.out_dims, layer.out_dims,
                     layer.grid_len,
                     tuple(float(v) for v in layer.grid_lims),
                     layer.denominator, layer.normalizer)
    c = params["C"].reshape(-1, params["C"].shape[-1])
    w = params["W"]
    single = x.ndim == 1
    batch_shape = x.shape[:-1]
    x2 = x.reshape(-1, layer.in_dims)
    y = kdense_single_apply(spec, x2, c, w, None)
    return y.reshape(*batch_shape, layer.out_dims)


def kan_chain_rhs(chain, interpret: bool | None = None):
    """rhs(t, u[K, I] or [I], params) using the fused kernel."""
    spec = chain_spec_of(chain)

    def rhs(t, u, params):
        c1, w1, c2, w2 = fused_params(params)
        single = u.ndim == 1
        x = u[None, :] if single else u
        y = kan_chain_apply(spec, x, c1, w1, c2, w2, interpret)
        return y[0] if single else y

    return rhs
