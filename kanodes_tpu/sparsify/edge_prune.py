"""Magnitude-threshold edge pruning for B-spline KAN layers.

Rebuild of `OptimizedKANLinear`'s pruning (`optimized_kan.py:256-273`):
edges whose spline-coefficient magnitude falls below a threshold are
zeroed via a persistent mask (soft pruning — shapes stay static, so the
jitted training step is unchanged; contrast with the reference KDense
`prune` which repacks shapes, `sparsify/prune.py`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def edge_magnitudes(params: dict) -> Array:
    """Per-edge mean |coeff| over the spline dimension: [I, O]
    (optimized_kan.py:258-262)."""
    return jnp.abs(params["coeff"]).mean(axis=1)


def prune_edges(params: dict, threshold: float) -> tuple[dict, Array]:
    """Zero out weak edges; returns (new params, keep mask [I, O])."""
    mag = edge_magnitudes(params)
    mask = (mag > threshold).astype(params["coeff"].dtype)
    out = dict(params)
    out["coeff"] = params["coeff"] * mask[:, None, :]
    if "scaler" in out:
        out["scaler"] = params["scaler"] * mask
    out["base_w"] = params["base_w"] * mask
    return out, mask


def prune_chain_edges(chain_params: list, threshold: float
                      ) -> tuple[list, list, int]:
    """Apply edge pruning to every layer; returns (params, masks,
    number of pruned edges) (optimized_kan.py:256-273 chain loop)."""
    new, masks, pruned = [], [], 0
    for p in chain_params:
        q, m = prune_edges(p, threshold)
        new.append(q)
        masks.append(m)
        pruned += int(np.prod(m.shape) - float(m.sum()))
    return new, masks, pruned
