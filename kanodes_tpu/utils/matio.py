"""MAT-file checkpoint interop with the reference toolchain.

The reference's entire post-hoc pipeline consumes `.mat` result files:
the KAN driver packages (p_list, loss, loss_test, kan_pred_t,
kan_pred_u1, kan_pred_u2, size_KAN) per run (`LV_driver_KANODE.jl:252-272`)
and the plotting / symbolic-regression stages reload them
(`Plotting_standard.jl:76-110`, `Symbolic_reg.jl:85`). This module
writes and reads that exact schema via scipy.io, so reference tooling
can post-process this framework's runs and vice versa.

Parameter rows are this framework's canonical flatten — per layer in
chain order, `C` (spline coefficients) then `W` (base weights), each in
C (row-major) order. `size_KAN` rides along as in the reference, so a
row can be reshaped back without the originating driver (see
`row_to_params`). Byte-layout parity with Julia's ComponentArray
ordering is NOT claimed: the reference scripts rebuild their own model
and only consume the arrays positionally through `p_list[idx, 1:n, 1]`,
which this layout serves.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

__all__ = ["params_to_row", "row_to_params", "save_mat_results",
           "load_mat_results", "lv_run_to_mat"]


def params_to_row(params: Any) -> np.ndarray:
    """Flatten a params pytree to one float64 row vector (canonical
    tree-leaf order: layer-major, then dict-key order 'C' < 'W')."""
    leaves = jax.tree_util.tree_leaves(params)
    return np.concatenate([np.asarray(x, np.float64).ravel()
                           for x in leaves])


def row_to_params(row: np.ndarray, template: Any) -> Any:
    """Inverse of `params_to_row` given any same-structure template
    (e.g. `model.init(key)`)."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    row = np.asarray(row).ravel()
    out, k = [], 0
    for leaf in leaves:
        n = int(np.prod(np.shape(leaf)) or 1)
        out.append(np.asarray(row[k:k + n], np.asarray(leaf).dtype)
                   .reshape(np.shape(leaf)))
        k += n
    if k != row.size:
        raise ValueError(f"row has {row.size} entries, template needs {k}")
    return jax.tree_util.tree_unflatten(treedef, out)


def save_mat_results(path: str, *, p_list, loss, loss_test,
                     kan_pred_t, kan_pred_u, size_kan) -> str:
    """Write the reference result schema (`LV_driver_KANODE.jl:252-272`).

    Args:
      p_list: [n_snapshots, P] array or a list of params pytrees /
        flat rows (pytrees are flattened via `params_to_row`).
      loss / loss_test: per-snapshot train / test loss histories
        (shorter histories are right-padded with their last value, the
        reference writes equal-length vectors).
      kan_pred_t: [T] prediction time grid.
      kan_pred_u: [T, 2] predicted trajectory (split into the
        reference's kan_pred_u1 / kan_pred_u2 columns).
      size_kan: (num_layers, layer_width, grid_size).
    """
    import scipy.io

    rows = []
    for p in (p_list if isinstance(p_list, (list, tuple)) else [p_list]):
        arr = np.asarray(p, np.float64) if isinstance(p, np.ndarray) \
            else params_to_row(p)
        rows.append(np.atleast_2d(arr))
    P = np.concatenate(rows, axis=0) if len(rows) > 1 or rows[0].ndim == 2 \
        else rows[0]
    P = np.asarray(P, np.float64)
    if P.ndim == 2:                      # reference stores [n, P, 1]
        P = P[:, :, None]

    def _pad(v, n):
        v = np.asarray(v, np.float64).ravel()
        if v.size < n:
            fill = v[-1] if v.size else 0.0
            v = np.concatenate([v, np.full(n - v.size, fill)])
        return v[:n]

    n = P.shape[0]
    u = np.asarray(kan_pred_u, np.float64)
    scipy.io.savemat(path, {
        "p_list": P,
        "loss": _pad(loss, n),
        "loss_test": _pad(loss_test, n),
        "kan_pred_t": np.asarray(kan_pred_t, np.float64).ravel(),
        "kan_pred_u1": u[:, 0],
        "kan_pred_u2": u[:, 1],
        "size_KAN": np.asarray(size_kan, np.float64).ravel(),
    })
    return path


def load_mat_results(path: str) -> dict:
    """Read a reference-schema result file (ours or the reference's own)
    into plain numpy arrays; scalar-squeezed fields are restored to the
    documented shapes (p_list -> [n, P], size_KAN -> [3])."""
    import scipy.io

    raw = scipy.io.loadmat(path)
    P = np.asarray(raw["p_list"], np.float64)
    if P.ndim == 3:
        P = P[:, :, 0]
    return {
        "p_list": P,
        "loss": np.asarray(raw["loss"], np.float64).ravel(),
        "loss_test": np.asarray(raw["loss_test"], np.float64).ravel(),
        "kan_pred_t": np.asarray(raw["kan_pred_t"], np.float64).ravel(),
        "kan_pred_u": np.stack(
            [np.asarray(raw["kan_pred_u1"], np.float64).ravel(),
             np.asarray(raw["kan_pred_u2"], np.float64).ravel()], axis=1),
        "size_KAN": np.asarray(raw["size_KAN"], np.float64).ravel(),
    }


def lv_run_to_mat(out: dict, path: str) -> str:
    """Package an `experiments.lv.run()` output dict (ideally from
    `LVConfig(record_history=True)`) into the reference schema. Falls
    back to a single final-params snapshot when no history was kept."""
    cfg, model = out["cfg"], out["model"]
    ts = out["data"]["ts"]
    pred = np.asarray(out["predict"](out["params"], ts))
    if "param_history" in out:
        n = jax.tree_util.tree_leaves(out["param_history"])[0].shape[0]
        p_list = [jax.tree_util.tree_map(lambda x: x[i],
                                         out["param_history"])
                  for i in range(n)]
        # histories are at eval cadence; subsample the train loss to it
        step = max(len(out["loss_history"]) // n, 1)
        loss = np.asarray(out["loss_history"])[step - 1::step][:n]
    else:
        p_list = [out["params"]]
        loss = np.asarray(out["loss_history"])[-1:]
    loss_test = np.asarray(out["eval_history"])[-len(p_list):]
    widths = (cfg.kan_widths if cfg.kan_widths is not None
              else (2, cfg.layer_width, 2))
    return save_mat_results(
        path, p_list=p_list, loss=loss, loss_test=loss_test,
        kan_pred_t=np.asarray(ts), kan_pred_u=pred,
        size_kan=(len(widths) - 1, widths[1], cfg.grid_size))
