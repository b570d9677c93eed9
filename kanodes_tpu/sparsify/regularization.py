"""Sparsity regularization (Eq. 12 of the KAN-ODEs paper).

Parity with `LV_driver_KANODE.jl:187-194`: an L1 term over the flat
parameter vector plus an entropy term over the L1-normalized magnitudes
(pushes mass onto few edges), combined as
    act_reg * sum|p| + entropy_reg * H(|p| / sum|p|).
The reference trains LV with (5e-4, 0) at `LV_driver_KANODE.jl:199-201`.
The PyTorch flavor's extra L2 / spline-smoothness terms
(`optimized_kan.py:211-233`) are provided as well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _flat_abs(params) -> Array:
    leaves = [jnp.abs(x).reshape(-1) for x in jax.tree_util.tree_leaves(params)]
    return jnp.concatenate(leaves)


def l1_entropy_reg(params, act_reg: float = 1.0, entropy_reg: float = 1.0,
                   eps: float = 1e-12) -> Array:
    """act_reg * sum|p|  +  entropy_reg * entropy(|p|/sum|p|)."""
    a = _flat_abs(params)
    total = jnp.sum(a)
    frac = a / (total + eps)
    entropy = -jnp.sum(frac * jnp.log(frac + eps))
    return act_reg * total + entropy_reg * entropy


def l2_reg(params, weight: float = 1.0) -> Array:
    """Sum of squares (optimized_kan.py:211-216)."""
    sq = sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(params))
    return weight * sq


def spline_smoothness_reg(kan_params, weight: float = 1.0) -> Array:
    """Second-difference penalty along each edge's grid coefficients
    (optimized_kan.py:218-233). Accepts chain params as a list of dicts
    with the spline tensor under "C" (KDense, [I, G, O]) or "coeff"
    (B-spline layers, [I, G+k, O]) — the penalty runs over the middle
    (grid) axis either way."""
    total = 0.0
    for p in kan_params:
        C = p["C"] if "C" in p else p.get("coeff")
        if C is None:
            continue
        d2 = C[:, 2:, :] - 2.0 * C[:, 1:-1, :] + C[:, :-2, :]
        total = total + jnp.sum(d2 * d2)
    return weight * total
