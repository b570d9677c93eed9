"""Implicit (stiff-capable) integration: ESDIRK with Newton iterations.

The reference generates stiff truth data with Rosenbrock23 / Rodas5
(`Allen-Cahn_Surrogate.jl:63`, `Schrodinger_Surrogate.jl:69`). The
framework's primary data path is host-side fine-step RK4 in float64
(`pde/datagen.py`), but a real implicit solver is part of the solver
family: Kvaerno3 — a 4-stage, 3rd-order, L-stable ESDIRK pair — with a
dense-Jacobian modified-Newton inner loop (`jax.jacfwd`; the systems
here are <= O(400) wide, so the [N, N] solve is a single MXU-friendly
`jnp.linalg.solve`).

Fixed-step on a save grid (like `odeint_fixed`); differentiable by
construction (Newton iterations are plain jnp ops under `lax.scan` —
implicit-function-theorem adjoints can come later if the backward cost
matters).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax


Array = jax.Array

# Kvaerno (2004) 3/2 ESDIRK tableau; gamma = 0.4358665215084590
_G = 0.4358665215084590
KV3_A = (
    (0.0,),
    (_G, _G),
    (0.490563388419108, 0.073570090080892, _G),
    (0.308809969973036, 1.490563388254106, -1.235239879727145, _G),
)
KV3_B = (0.308809969973036, 1.490563388254106, -1.235239879727145, _G)
KV3_C = (0.0, 2 * _G, 1.0, 1.0)


def _newton_solve(f, t, y0, rhs_const, gamma_dt, newton_iters: int):
    """Solve y = rhs_const + gamma_dt * f(t, y) by modified Newton with a
    fresh dense Jacobian per step."""
    n = y0.shape[0]
    J = jax.jacfwd(lambda y: f(t, y))(y0)            # [N, N]
    A = jnp.eye(n, dtype=y0.dtype) - gamma_dt * J

    def body(y, _):
        g = y - rhs_const - gamma_dt * f(t, y)
        dy = jnp.linalg.solve(A, g)
        return y - dy, None

    y, _ = lax.scan(body, y0, None, length=newton_iters)
    return y


def kvaerno3_step(f, t, y, dt, args, newton_iters: int = 4):
    """One Kvaerno3 ESDIRK step (flat-array state)."""
    def fa(ti, yi):
        return f(ti, yi, args)

    k = [None] * 4
    k[0] = fa(t, y)
    for i in (1, 2, 3):
        # stage equation: yi = y + dt sum_{j<i} a_ij k_j + dt*gamma*f(ti, yi)
        acc = y
        for j in range(i):
            if KV3_A[i][j] != 0.0:
                acc = acc + dt * KV3_A[i][j] * k[j]
        ti = t + KV3_C[i] * dt
        yi = _newton_solve(fa, ti, acc, acc, dt * _G, newton_iters)
        k[i] = fa(ti, yi)
    y1 = y
    for i in range(4):
        if KV3_B[i] != 0.0:
            y1 = y1 + dt * KV3_B[i] * k[i]
    return y1


def odeint_implicit(f, y0: Array, ts: Array, args=None, *,
                    substeps: int = 1, newton_iters: int = 4) -> Array:
    """Fixed-grid ESDIRK solve at save times `ts` (flat-array state).

    Suitable for stiff semi-discrete PDEs where an explicit stepper's
    stability bound, not accuracy, dictates the step size.
    """
    ts = jnp.asarray(ts)
    y0 = jnp.asarray(y0)

    def interval(y, t_pair):
        t0, t1 = t_pair
        h = (t1 - t0) / substeps

        def sub(y, i):
            return kvaerno3_step(f, t0 + i * h, y, h, args,
                                 newton_iters), None

        y, _ = lax.scan(sub, y, jnp.arange(substeps))
        return y, y

    _, ys = lax.scan(interval, y0, (ts[:-1], ts[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)
