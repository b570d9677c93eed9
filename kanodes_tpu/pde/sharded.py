"""Grid-sharded PDE right-hand sides over a device mesh.

The reference never scales beyond one CPU; its largest grid is the
402-dim Schrödinger state (SURVEY.md §5.7). This module is the TPU
answer for when grids DO grow: shard the spatial axis over ICI with
`shard_map`, exchange one-cell halos with `lax.ppermute`, and keep the
pointwise KAN evaluation fully local. This is the project's analogue of
sequence/context parallelism — the only cross-device traffic is the
2-element halo per step, which rides ICI.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

Array = jax.Array


def halo_exchange(u_local: Array, axis_name: str) -> tuple[Array, Array]:
    """Return (left_ghost, right_ghost) cells from ring neighbors.

    Periodic by construction of the ring permutation.
    """
    n = lax.psum(1, axis_name)
    right_src = [(i, (i + 1) % n) for i in range(n)]   # send right edge ->
    left_src = [(i, (i - 1) % n) for i in range(n)]
    left_ghost = lax.ppermute(u_local[-1:], axis_name, right_src)
    right_ghost = lax.ppermute(u_local[:1], axis_name, left_src)
    return left_ghost, right_ghost


def sharded_laplacian_periodic(mesh: Mesh, dx: float,
                               axis: str = "sp") -> Callable[[Array], Array]:
    """Periodic centered Laplacian on a grid sharded along `axis`."""

    def local(u_local: Array) -> Array:
        lg, rg = halo_exchange(u_local, axis)
        up = jnp.concatenate([lg, u_local, rg])
        return (up[2:] - 2.0 * up[1:-1] + up[:-2]) / (dx * dx)

    return shard_map(local, mesh=mesh, in_specs=P(axis), out_specs=P(axis))


def sharded_graybox_rhs(mesh: Mesh, dx: float, diffusivity: float,
                        model, axis: str = "sp"):
    """Sharded version of the Fisher-KPP / Allen-Cahn gray-box RHS:
    D * lap(u) + kan.(u), u sharded along `axis`; KAN params replicated.

    Returns rhs(t, u, params) usable directly by the ode solvers under
    jit — the solver's scan runs SPMD with only halo traffic per stage.
    """

    def local(u_local: Array, params) -> Array:
        lg, rg = halo_exchange(u_local, axis)
        up = jnp.concatenate([lg, u_local, rg])
        lap = (up[2:] - 2.0 * up[1:-1] + up[:-2]) / (dx * dx)
        learned = model.apply(params, u_local[:, None])[:, 0]
        return diffusivity * lap + learned

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P()), out_specs=P(axis))

    def rhs(t, u, params):
        return fn(u, params)

    return rhs


def sharded_laplacian_dirichlet(mesh: Mesh, dx: float, axis: str = "sp",
                                left: float = 0.0, right: float = 0.0):
    """Dirichlet-ghost centered Laplacian on a grid sharded along `axis`:
    interior shards exchange halos; the first/last shard substitute the
    boundary values."""

    def local(u_local: Array) -> Array:
        n = lax.psum(1, axis)
        idx = lax.axis_index(axis)
        lg, rg = halo_exchange(u_local, axis)
        lg = jnp.where(idx == 0, jnp.full_like(lg, left), lg)
        rg = jnp.where(idx == n - 1, jnp.full_like(rg, right), rg)
        up = jnp.concatenate([lg, u_local, rg])
        return (up[2:] - 2.0 * up[1:-1] + up[:-2]) / (dx * dx)

    return shard_map(local, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
