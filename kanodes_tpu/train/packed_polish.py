"""Mask-aware packed L-BFGS: per-member second-order polish for
block-diagonal ensembles.

`train/polish.polish_members` vmaps the single-member L-BFGS over a
STACKED member axis, which requires every member to have the same
parameter shapes. Heterogeneous packs (`models/packed.HeteroPacked` —
the Fig-3C trend sweep's different widths and grid sizes,
`/root/reference/Lotka-Volterra/trend_plotter.py:7-8`) have no stacked
layout, so their polish tail previously fell back to one compile +
dispatch chain per member. This module runs S INDEPENDENT L-BFGS
instances on ONE packed parameter tree in one jitted scan:

- every inner product of the two-loop recursion is computed PER MEMBER
  over its block (segment-sum keyed by a member-index tree), so the
  curvature history never mixes members;
- the backtracking Armijo line search carries a per-member step vector
  t[S] — each member halves independently, and a member that satisfies
  the condition stops moving its t while the others keep searching;
- curvature pairs failing the per-member y·s > 0 check are zero-masked
  for that member only (its rho entry becomes 0, so the pair drops out
  of its two-loop while remaining live for the members that accepted).

Because members own disjoint blocks and the loss is masked
(`apply_mask` inside `loss_vec_fn`), the packed run is mathematically
identical to S separate L-BFGS runs — verified member-by-member against
S=1 packs in `tests/test_packed_polish.py`. The line search here is
backtracking-Armijo rather than `polish()`'s zoom, so single-member
trajectories are compared against an S=1 pack of the SAME algorithm,
not against `polish()`.

The reference has no second-order phase at all (Adam-only,
`LV_driver_KANODE.jl:219`); this exists because at the f32 loss floor
Adam wanders by ~lr (EXPERIMENTS.md best-capture section) and a
curvature-aware polish is how records are delivered.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class PackedPolishConfig:
    iters: int = 200
    memory_size: int = 10
    # max per-step halvings of the per-member Armijo backtracking
    linesearch_steps: int = 25
    c1: float = 1e-4


def _flat(tree) -> jax.Array:
    return jnp.concatenate(
        [jnp.ravel(x) for x in jax.tree_util.tree_leaves(tree)])


def _make_ops(ids, mask, n_members: int):
    """Per-member block algebra on packed trees.

    `ids` (int32) names each entry's owning member; `mask` (0/1) zeroes
    off-block entries, so the id of an off-block entry never matters.
    """
    ids_flat = _flat(ids).astype(jnp.int32)
    mask_flat = _flat(mask)

    def mdot(a, b) -> jax.Array:          # [S] per-member <a, b>
        prod = _flat(a) * _flat(b) * mask_flat
        return jax.ops.segment_sum(prod, ids_flat,
                                   num_segments=n_members)

    def mscale(tree, v):                  # member s's block *= v[s]
        return jax.tree_util.tree_map(
            lambda x, i, m: x * m * v[i], tree, ids, mask)

    def mselect(cond, a, b):              # per-member where
        return jax.tree_util.tree_map(
            lambda xa, xb, i, m: m * jnp.where(cond[i], xa, xb),
            a, b, ids, mask)

    return mdot, mscale, mselect


def polish_packed(loss_vec_fn: Callable[[Any], jax.Array], params: Any,
                  *, ids: Any, mask: Any, n_members: int,
                  cfg: PackedPolishConfig = PackedPolishConfig()) -> dict:
    """L-BFGS-polish S packed ensemble members simultaneously.

    `loss_vec_fn` maps the PACKED param tree to per-member losses [S]
    and must already apply the block mask inside (so off-block
    gradients are exactly zero); build the (ids, mask) pair with
    `models.packed.member_ids` + `block_mask` (homogeneous) or
    `HeteroPacked.member_ids()` + `.mask()`.

    Returns {params, best_loss [S], loss_history [iters, S]}; `params`
    holds each member's best-so-far block (per-member argmin over the
    trajectory including the start — no member ever gets worse).
    """
    mdot, mscale, mselect = _make_ops(ids, mask, n_members)
    S, M = n_members, cfg.memory_size

    def _val(p):
        v = loss_vec_fn(p)
        return v.sum(), v

    val_grad = jax.value_and_grad(_val, has_aux=True)

    tree_add = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)
    tree_sub = lambda a, b: jax.tree_util.tree_map(jnp.subtract, a, b)
    tree_neg = lambda a: jax.tree_util.tree_map(jnp.negative, a)

    def tree_idx(h, k):
        return jax.tree_util.tree_map(
            lambda x: lax.dynamic_index_in_dim(x, k, 0, keepdims=False), h)

    def step(carry, _):
        p, f, g, hs, hy, rho, best_p, best_v = carry
        dt = f.dtype

        # two-loop recursion with per-member scalars (slot M-1 newest)
        def bwd(i, c):
            q, al = c
            k = M - 1 - i
            sk, yk = tree_idx(hs, k), tree_idx(hy, k)
            a = rho[k] * mdot(sk, q)
            return tree_sub(q, mscale(yk, a)), al.at[k].set(a)

        q, alphas = lax.fori_loop(0, M, bwd, (g, jnp.zeros((M, S), dt)))
        y_new, s_new = tree_idx(hy, M - 1), tree_idx(hs, M - 1)
        yy, sy = mdot(y_new, y_new), mdot(s_new, y_new)
        gamma = jnp.where(yy > 0, sy / jnp.where(yy > 0, yy, 1.0), 1.0)
        r = mscale(q, gamma)

        def fwd(k, r):
            sk, yk = tree_idx(hs, k), tree_idx(hy, k)
            b = rho[k] * mdot(yk, r)
            return tree_add(r, mscale(sk, alphas[k] - b))

        d = tree_neg(lax.fori_loop(0, M, fwd, r))

        # descent safeguard: a member whose two-loop direction is not a
        # descent direction falls back to steepest descent
        gd = mdot(g, d)
        bad = gd >= 0
        d = mselect(bad, tree_neg(g), d)
        gd = jnp.where(bad, -mdot(g, g), gd)

        # per-member backtracking Armijo: t[S] halves independently
        def ls_cond(c):
            i, t, done = c
            return (i < cfg.linesearch_steps) & ~done.all()

        def ls_body(c):
            i, t, done = c
            fc = loss_vec_fn(tree_add(p, mscale(d, t)))
            ok = (fc <= f + cfg.c1 * t * gd) & jnp.isfinite(fc)
            done = done | ok
            return i + 1, jnp.where(done, t, t * 0.5), done

        _, t, ok = lax.while_loop(
            ls_cond, ls_body,
            (jnp.zeros((), jnp.int32), jnp.ones((S,), dt),
             jnp.zeros((S,), bool)))
        t = jnp.where(ok, t, 0.0)        # exhausted search: don't move

        p_new = tree_add(p, mscale(d, t))
        (_, f_new), g_new = val_grad(p_new)

        # per-member cautious curvature update: members whose pair
        # fails y.s > 0 (incl. the t=0 no-move case) store a zero pair
        s_vec, y_vec = tree_sub(p_new, p), tree_sub(g_new, g)
        ys = mdot(y_vec, s_vec)
        valid = ys > 0
        vf = valid.astype(dt)
        s_store, y_store = mscale(s_vec, vf), mscale(y_vec, vf)
        rho_new = jnp.where(valid, 1.0 / jnp.where(valid, ys, 1.0), 0.0)
        roll = lambda h, n: jax.tree_util.tree_map(
            lambda x, xn: jnp.concatenate([x[1:], xn[None]]), h, n)
        hs, hy = roll(hs, s_store), roll(hy, y_store)
        rho = jnp.concatenate([rho[1:], rho_new[None]])

        better = f_new < best_v
        best_p = mselect(better, p_new, best_p)
        best_v = jnp.minimum(f_new, best_v)
        return (p_new, f_new, g_new, hs, hy, rho, best_p, best_v), f_new

    def run(p0):
        (_, f0), g0 = val_grad(p0)
        zeros_like_M = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.zeros((M,) + x.shape, x.dtype), t)
        carry = (p0, f0, g0, zeros_like_M(p0), zeros_like_M(p0),
                 jnp.zeros((M, S), f0.dtype), p0, f0)
        carry, history = lax.scan(step, carry, None, length=cfg.iters)
        _, _, _, _, _, _, best_p, best_v = carry
        return best_p, best_v, history

    best_p, best_v, history = jax.jit(run)(params)
    return {"params": best_p, "best_loss": best_v,
            "loss_history": history}
