"""Minimal functional layer protocol.

Layers are *static* frozen dataclasses (hashable jit constants); parameters
are plain pytrees (dicts / lists of arrays) produced by `init` and consumed
by `apply`. This replaces the reference's LuxCore layer protocol
(`initialparameters`/`initialstates`, `kdense.jl:70-92`) with the JAX-native
split: configuration is trace-time static, parameters are traced values, and
the basis grid — a Lux "state" in the reference — is a static constant baked
into the jitted graph (it never trains and never changes shape).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Protocol, runtime_checkable

import jax
import jax.numpy as jnp

Array = jax.Array


@runtime_checkable
class Layer(Protocol):
    in_dims: int
    out_dims: int

    def init(self, key: Array): ...
    def apply(self, params, x: Array) -> Array: ...
    def num_params(self) -> int: ...


def glorot_uniform(key: Array, shape: tuple[int, ...], fan_in: int,
                   fan_out: int, dtype=jnp.float32) -> Array:
    """Glorot/Xavier uniform with explicit fans.

    The reference initializes `C` as a [O, G*I] matrix (fan_in = G*I) via
    WeightInitializers.glorot_uniform (`kdense.jl:75`); we store `C` as
    [I, G, O] so the fans must be given explicitly rather than inferred
    from the trailing axes.
    """
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def frozen(cls):
    """Decorator: frozen dataclass usable as a static jit argument."""
    return dataclasses.dataclass(frozen=True)(cls)


class Chain:
    """Sequential container: params is a list (one pytree per layer)."""

    def __init__(self, *layers):
        if not layers:
            raise ValueError("Chain needs at least one layer")
        for a, b in zip(layers[:-1], layers[1:]):
            if a.out_dims != b.in_dims:
                raise ValueError(
                    f"layer size mismatch: {a.out_dims} -> {b.in_dims}")
        self.layers = tuple(layers)
        self.in_dims = layers[0].in_dims
        self.out_dims = layers[-1].out_dims

    def init(self, key: Array):
        keys = jax.random.split(key, len(self.layers))
        return [l.init(k) for l, k in zip(self.layers, keys)]

    def apply(self, params, x: Array) -> Array:
        for layer, p in zip(self.layers, params):
            x = layer.apply(p, x)
        return x

    def num_params(self) -> int:
        return sum(l.num_params() for l in self.layers)

    def __iter__(self):
        return iter(self.layers)

    def __len__(self):
        return len(self.layers)

    def __getitem__(self, i):
        return self.layers[i]


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
