"""Packed (block-diagonal) KAN ensembles — S replicas as ONE wider chain.

Motivation (measured, EXPERIMENTS.md multi-seed section): `jax.vmap`
over member params lifts the member axis into the Pallas kernel GRID,
which SERIALIZES the latency-bound in-kernel step chain S times — the
vmapped 8-seed LV sweep ran only 1.5x faster than sequential. Packing
instead embeds the S member chains as block-diagonal weights of a
single [S*I, S*H, S*O] chain: the member axis rides the GEMM
width (MXU lanes), where extra width is free at these latency-bound
sizes, so the whole ensemble steps at ~single-member latency.

Correctness: a KDense output is a sum over input edges of per-edge
functions of a SINGLE input (`models/kdense.py:5-7` — elementwise
normalizer/basis/base-act, then one GEMM over (input, grid) pairs).
With C and W zero outside the member-diagonal blocks, member s outputs
therefore depend only on member s inputs — the packed chain computes S
independent forwards exactly (up to f32 summation-order rounding: the
dense GEMM accumulates the member's terms alongside exact zeros).

Gradient isolation is by construction: train the dense params through
`apply_mask` (multiply by the 0/1 block mask inside the loss), so
off-block gradients are exactly zero and Adam never moves off-block
entries from zero. The packed state vector is member-major:
member s owns dims [s*d, (s+1)*d).

Adaptive stepping: the plain `odeint` over a packed state would share
ONE controller (a joint error norm) and couple members through dt, so
packed adaptive solves go through `ode.odeint_members` instead — one
independent save-clipped controller per member (member-blocked error
norms, per-member dt/t/save_idx vectors). `experiments.lv.make_ode_fns`
routes there when given `reduce_fn` + `n_members` with
solve_mode="adaptive", making the reference-faithful adaptive protocol
(`LV_driver_KANODE.jl:180-184`) available to packed ensembles.

The reference has no ensemble concept at all (seed studies are
hand-edited sequential reruns, `Lotka-Volterra/LV_driver_KANODE.jl:114`);
this is a TPU-first capability.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from kanodes_tpu.models.kdense import KANChain, KDense

Array = jax.Array


def _check(chain: KANChain) -> None:
    for l in chain.layers:
        if not isinstance(l, KDense):
            raise ValueError("packing supports KDense chains only")
        if l.trainable_grid:
            raise ValueError("a packed layer shares one grid; "
                             "trainable_grid would couple members")


def pack_chain(chain: KANChain, n_members: int) -> KANChain:
    """The S-member packed chain: every layer's in/out dims scaled by S
    (grid/basis/normalizer unchanged — they are elementwise/per-dim and
    member-independent)."""
    _check(chain)
    layers = [dataclasses.replace(l, in_dims=n_members * l.in_dims,
                                  out_dims=n_members * l.out_dims)
              for l in chain.layers]
    return KANChain(*layers)


def pack_params(chain: KANChain, member_params: list) -> list:
    """Block-diagonal dense params from S per-member param trees.

    `member_params` is a list of S chain-param lists (as returned by
    `chain.init`). Returns the packed chain's param list: per layer,
    C [S*I, G, S*O] and W [S*I, S*O] with member s occupying the
    (s*I:(s+1)*I, :, s*O:(s+1)*O) block and exact zeros elsewhere.
    """
    _check(chain)
    S = len(member_params)
    packed = []
    for li, l in enumerate(chain.layers):
        I, G, O = l.in_dims, l.grid_len, l.out_dims
        C = jnp.zeros((S * I, G, S * O),
                      member_params[0][li]["C"].dtype)
        for s in range(S):
            C = C.at[s * I:(s + 1) * I, :, s * O:(s + 1) * O].set(
                member_params[s][li]["C"])
        p = {"C": C}
        if l.use_base_act:
            W = jnp.zeros((S * I, S * O),
                          member_params[0][li]["W"].dtype)
            for s in range(S):
                W = W.at[s * I:(s + 1) * I, s * O:(s + 1) * O].set(
                    member_params[s][li]["W"])
            p["W"] = W
        packed.append(p)
    return packed


def extract_member(chain: KANChain, packed_params: list, n_members: int,
                   member: int) -> list:
    """Member `member`'s original-shape params out of the packed tree."""
    _check(chain)
    out = []
    for li, l in enumerate(chain.layers):
        I, O = l.in_dims, l.out_dims
        sI, sO = member * I, member * O
        p = {"C": packed_params[li]["C"][sI:sI + I, :, sO:sO + O]}
        if l.use_base_act:
            p["W"] = packed_params[li]["W"][sI:sI + I, sO:sO + O]
        out.append(p)
    return out


def block_mask(chain: KANChain, n_members: int) -> list:
    """The 0/1 block-diagonal mask with the packed params' structure."""
    _check(chain)
    one = [{k: jnp.ones_like(v) for k, v in p.items()}
           for p in chain.init(jax.random.PRNGKey(0))]
    return pack_params(chain, [one] * n_members)


def apply_mask(mask: list, packed_params: list) -> list:
    """mask * params, leafwise — used INSIDE the loss so off-block
    gradients vanish exactly (d/dp of f(mask*p) carries the mask)."""
    return jax.tree_util.tree_map(jnp.multiply, mask, packed_params)


def member_mean(n_members: int):
    """`reduce_fn` for `make_ode_fns`-style losses over a packed state:
    squared-error tensor [..., S*d] -> per-member mean vector [S]."""
    def reduce(err: Array) -> Array:
        d = err.shape[-1] // n_members
        e = err.reshape(err.shape[:-1] + (n_members, d))
        axes = tuple(i for i in range(e.ndim) if i != e.ndim - 2)
        return e.mean(axis=axes)
    return reduce


def tile_state(x: Array, n_members: int) -> Array:
    """Tile data/state along the last axis for the packed chain
    ([..., d] -> [..., S*d], member-major)."""
    return jnp.tile(x, (1,) * (x.ndim - 1) + (n_members,))
