"""Second-order polish for converged minima (L-BFGS with line search).

At the f32 loss floor first-order Adam WANDERS by ~lr around the
minimum (CLAUDE.md numerics notes; the reference never gets near the
floor — its `LV_driver_KANODE.jl:219` Adam(5e-4) runs 1e5 iterations
and stops optimization-limited, not capacity-limited). A quasi-Newton
polish answers the question Adam cannot: is the remaining error the
MODEL's capacity or the OPTIMIZER's noise floor?

`polish()` runs optax L-BFGS (zoom line search) as one device-side
`lax.scan`, so a few hundred curvature-aware steps cost one dispatch.
The scan carries best-so-far params: the line search guarantees
per-step decrease only up to f32 rounding, and near the floor the
value sequence is not monotone.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax import lax


@dataclasses.dataclass(frozen=True)
class PolishConfig:
    iters: int = 200
    memory_size: int = 10
    # max loss/grad evaluations the zoom line search may spend per step
    linesearch_steps: int = 20


def _make_run(loss_fn: Callable[[Any], jax.Array], cfg: PolishConfig):
    """The single-start L-BFGS scan as a pure function p0 -> (best_p,
    best_v, history). Shared by `polish` (jit) and `polish_members`
    (jit of vmap)."""
    opt = optax.lbfgs(
        memory_size=cfg.memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=cfg.linesearch_steps))
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def _take_better(better, cand_p, cand_v, best_p, best_v):
        new_p = jax.tree.map(lambda n, b: jnp.where(better, n, b),
                             cand_p, best_p)
        return new_p, jnp.where(better, cand_v, best_v)

    def step(carry, _):
        p, state, best_p, best_v = carry
        # value/grad at the CURRENT p (pre-update) — this is the point
        # the best-tracking must record
        value, grad = value_and_grad(p, state=state)
        best_p, best_v = _take_better(value < best_v, p, value,
                                      best_p, best_v)
        updates, state = opt.update(grad, state, p, value=value,
                                    grad=grad, value_fn=loss_fn)
        p = optax.apply_updates(p, updates)
        return (p, state, best_p, best_v), value

    def run(p0):
        v0 = loss_fn(p0)
        state = opt.init(p0)
        carry = (p0, state, p0, v0)
        carry, history = lax.scan(step, carry, None, length=cfg.iters)
        p, _, best_p, best_v = carry
        # the final post-update point is never seen inside the scan
        vf = loss_fn(p)
        best_p, best_v = _take_better(vf < best_v, p, vf, best_p, best_v)
        return best_p, best_v, history

    return run


def polish(loss_fn: Callable[[Any], jax.Array], params: Any,
           cfg: PolishConfig = PolishConfig()) -> dict:
    """L-BFGS-polish `params` against scalar `loss_fn`.

    Returns {params, best_loss, loss_history}; `params` are the
    best-so-far (lowest loss seen, including the starting point —
    polish never returns something worse than its input).
    """
    best_p, best_v, history = jax.jit(_make_run(loss_fn, cfg))(params)
    return {"params": best_p, "best_loss": best_v,
            "loss_history": history}


def polish_members(loss_fn: Callable[[Any], jax.Array], stacked_params: Any,
                   cfg: PolishConfig = PolishConfig()) -> dict:
    """Polish S members SIMULTANEOUSLY: one jitted vmap of the
    single-member L-BFGS scan over a leading member axis.

    `loss_fn` is the SINGLE-member loss; `stacked_params` is a tree
    whose every leaf carries a leading member axis (the layout produced
    by `jax.tree.map(lambda *xs: jnp.stack(xs), *member_trees)`). Each
    member runs its own zoom line search — under vmap the line-search
    while_loops execute until the slowest member finishes, with
    already-converged members masked, so per-member trajectories match
    sequential `polish` up to batched-GEMM rounding.

    Why this exists: ensemble capture flows (e.g.
    `scripts/burgers_multiseed_packed.py`) polish one snapshot per seed;
    sequential `polish` calls each pay a fresh jit compile and a
    separate device dispatch chain. One vmapped program compiles once
    and amortizes the launch-latency-bound scan across members (the
    same lever as the packed training itself).

    Returns {params, best_loss [S], loss_history [S, iters]}.
    """
    run_v = jax.jit(jax.vmap(_make_run(loss_fn, cfg)))
    best_p, best_v, history = run_v(stacked_params)
    return {"params": best_p, "best_loss": best_v,
            "loss_history": history}
