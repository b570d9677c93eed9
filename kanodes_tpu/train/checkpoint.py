"""Checkpoint / resume.

The reference has three checkpoint flavors (SURVEY.md §5.4): .mat files
with the FULL parameter history every 1000 iters
(`LV_driver_KANODE.jl:252-272`), Julia Serialization dicts
(`StrainLimiting_KAN_PINN.jl:433-461`), and torch.save dicts
(`StrainLimiting_KAN_PINN.py:1616-1662`) — all restartable after power
loss ("is_restart ... useful for power interruptions",
`LV_driver_KANODE.jl:18-23`).

Here: one orbax-backed store saving (params, opt_state, loss histories,
rng key, step) with atomic versioned directories, plus an optional
bounded parameter-history ring (the reference's post-hoc argmin-over-
history selection capability without O(iters x params) growth — the
train loop already tracks best params online).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except ImportError:       # pragma: no cover
    _HAVE_ORBAX = False


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any = None
    step: int = 0
    loss_history: Any = None
    eval_history: Any = None
    best_params: Any = None
    best_loss: float = float("inf")
    rng_key: Any = None
    extra: dict | None = None


class Checkpointer:
    """Versioned checkpoint directory with keep-last-N retention."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)
        if _HAVE_ORBAX:
            self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:012d}")

    def steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                out.append(int(name.split("_")[1]))
        return sorted(out)

    def save(self, state: TrainState) -> str:
        tree = dataclasses.asdict(state)
        tree = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)
        path = self._path(state.step)
        if _HAVE_ORBAX:
            self._ckptr.save(path, tree, force=True)
        else:  # numpy fallback: atomic pickled-tree write
            import shutil
            os.makedirs(path + ".tmp", exist_ok=True)
            arr = np.empty((), dtype=object)
            arr[()] = tree
            np.save(os.path.join(path + ".tmp", "state.npy"), arr,
                    allow_pickle=True)
            shutil.rmtree(path, ignore_errors=True)
            os.replace(path + ".tmp", path)
        self._retain()
        return path

    def restore(self, step: int | None = None) -> dict:
        steps = self.steps()
        if not steps:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        step = steps[-1] if step is None else step
        path = self._path(step)
        if _HAVE_ORBAX and not os.path.exists(
                os.path.join(path, "state.npy")):
            return self._ckptr.restore(path)
        return np.load(os.path.join(path, "state.npy"),
                       allow_pickle=True).item()

    def latest_step(self) -> int | None:
        steps = self.steps()
        return steps[-1] if steps else None

    def _retain(self) -> None:
        steps = self.steps()
        for s in steps[:-self.keep]:
            import shutil
            shutil.rmtree(self._path(s), ignore_errors=True)


def select_from_history(param_history, metric_history, k: int = 0):
    """Post-hoc model selection over a recorded parameter history.

    The reference stores every iteration's flat params (`p_list`,
    `LV_driver_KANODE.jl:252-272`) and selects the plotting/SR model as
    the argmin over the stored loss vector after the fact
    (`Plotting_standard.jl:105-110`). Here the history is the bounded
    snapshot ring produced by `train(..., record_history=True)` (one
    snapshot per eval point) and selection can target ANY recorded
    metric — e.g. the test-horizon loss rather than the train loss.

    Args:
      param_history: pytree with leading axis n_snapshots (stacked params).
      metric_history: [n_snapshots] metric aligned with the snapshots.
      k: 0 -> argmin params; k>0 -> list of the k best (ascending metric).

    Returns (params, index, metric) for k == 0, else a list of such
    triples.
    """
    metric = np.asarray(metric_history)
    n = jax.tree_util.tree_leaves(param_history)[0].shape[0]
    if metric.shape[0] != n:
        raise ValueError(
            f"history length {n} != metric length {metric.shape[0]}")
    order = np.argsort(metric, kind="stable")

    def pick(i):
        p = jax.tree_util.tree_map(lambda x: x[i], param_history)
        return p, int(i), float(metric[i])

    if k == 0:
        return pick(int(order[0]))
    return [pick(int(i)) for i in order[:k]]


def select_members_from_history(param_history, metric_history):
    """Per-member `select_from_history` for multi-seed runs.

    `train()`'s vector-loss mode records `param_history` with leaves of
    shape [n_snapshots, S, ...] and `eval_history` of shape
    [n_snapshots, S]; this returns a list of S (params, index, metric)
    triples — each member's argmin-metric snapshot.
    """
    metric = np.asarray(metric_history)
    if metric.ndim != 2:
        raise ValueError(f"expected [n_snapshots, S] metric, "
                         f"got shape {metric.shape}")
    out = []
    for s in range(metric.shape[1]):
        hist_s = jax.tree_util.tree_map(lambda x: x[:, s], param_history)
        out.append(select_from_history(hist_s, metric[:, s]))
    return out
