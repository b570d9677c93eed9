"""Numerical sanitizers / debug-mode validators.

The reference's closest analogues to race detection are numerical
sanitizers (SURVEY.md §5.2): NaN/finite grid sweeps
(`StrainLimiting_KAN_PINN.jl:375-392`), eps-guarded norms, clamped
widths, and stability heuristics. Here:

  * `validate_finite(tree)` — host-side assert over a pytree;
  * `check_finite(tree)` — in-graph boolean (all leaves finite);
  * `nan_guard(fn)` — wraps a jitted step, raising on the host when the
    output goes non-finite (a cheap `jax.debug_nans` substitute that
    works with scans and doesn't deoptimize);
  * `enable_debug_nans()` — the full jax debug-nans switch for
    interactive hunting.
"""

from __future__ import annotations

from functools import wraps

import jax
import jax.numpy as jnp

Array = jax.Array


def check_finite(tree) -> Array:
    """In-graph: True iff every leaf of the pytree is finite."""
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.asarray(True)
    for x in leaves:
        ok = ok & jnp.all(jnp.isfinite(x))
    return ok


def validate_finite(tree, name: str = "tree") -> None:
    """Host-side assert with the offending leaf paths in the message."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        import numpy as np
        arr = np.asarray(leaf)
        n_bad = int(np.sum(~np.isfinite(arr)))
        if n_bad:
            bad.append(f"{jax.tree_util.keystr(path)}: {n_bad} non-finite")
    if bad:
        raise FloatingPointError(f"{name} contains non-finite values:\n  "
                                 + "\n  ".join(bad))


def nan_guard(fn):
    """Wrap a step function; raises FloatingPointError on the host if any
    output leaf is non-finite. Adds one all-reduce per call."""

    @wraps(fn)
    def wrapped(*args, **kw):
        out = fn(*args, **kw)
        if not bool(check_finite(out)):
            validate_finite(out, name=fn.__name__ + " output")
        return out

    return wrapped


def enable_debug_nans(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)
