"""Matmul precision policy.

On TPU, XLA's DEFAULT matmul precision feeds the MXU bfloat16 inputs
(~1e-2 relative error) — fine for big-transformer training, fatal for
ODE-solver numerics chasing 1e-7 losses (measured here: a [34,10]x[10,10]
f32 dot at DEFAULT precision is 0.027 off its f64 value; at HIGHEST it
is 7e-7 off). Every matmul in this library goes through this policy;
the default is HIGHEST (full f32, 6-pass MXU) because all reference
workloads are tiny and latency-bound — the extra passes are free.
"""

from __future__ import annotations

import jax

_PRECISION = jax.lax.Precision.HIGHEST


def matmul_precision() -> jax.lax.Precision:
    return _PRECISION


def set_matmul_precision(p) -> None:
    """p: jax.lax.Precision or one of 'default' | 'high' | 'highest'."""
    global _PRECISION
    if isinstance(p, str):
        p = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}[p.lower()]
    _PRECISION = p
