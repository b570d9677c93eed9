"""Record backend-keyed recompute expectations for the deep claims.

The deep tier of the claims ledger (`diag/claims.py --deep`) reloads
every deliverable param file and recomputes the headline MSEs. Those
recomputes are backend-sensitive at the f32 floor (CPU vs TPU forward
rounding: 25-30% at the 1e-8 LV floor, up to ~4x at the 1e-14 surrogate
floor), so the expectations are stored PER BACKEND in each artifact —
this script measures them on whatever backend it runs on and writes
them under row["recompute"][<cpu|tpu>]. Run it once per backend after
any change to the deliverable params or the forward-path code:

    python scripts/record_recompute.py            # current backend
    (run on both CPU and TPU so both keys exist)

On TPU it additionally records the fused-flow recompute of the
floor-level records (row["recompute"]["tpu"]["fused_mse"]) — the
genuine same-flow reproduction the deep check compares against the
claimed record.

CPU runs force the platform the CLAUDE.md way (config update after
import; env overrides are ignored): pass --cpu.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from kanodes_tpu.diag.claims import (REPO, _backend, _by, _lv_recompute,
                                     _surrogate_recompute,
                                     _surrogate_recompute_fused)


def _update(rel: str, match_key: str, match_val: str, values: dict):
    path = os.path.join(REPO, rel)
    with open(path) as f:
        rows = json.load(f)
    row = _by(match_key, match_val, rows)
    rec = row.setdefault("recompute", {})
    rec.setdefault(_backend(), {}).update(values)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"{rel} [{match_val}] recompute[{_backend()}] <- {values}")


def main():
    b = _backend()
    print(f"backend: {b} ({jax.devices()[0].device_kind})")

    for basis in ("rbf", "iqf"):
        train, test = _lv_recompute(basis)
        _update("artifacts/lv_best.json", "basis", basis,
                {"train_mse": train, "test_mse": test})

    _update("artifacts/surrogate_best.json", "problem", "burgers",
            {"snapshot_mse": _surrogate_recompute("burgers")})

    records = [
        ("artifacts/surrogate_fast_seed1.json", "schrodinger",
         "artifacts/schrodinger_fast_seed1_polished_params.npy"),
        ("artifacts/surrogate_fast_seed4.json", "allen_cahn_2d",
         "artifacts/allen_cahn_2d_fast_seed4_polished_params.npy"),
    ]
    for rel, problem, params_rel in records:
        vals = {"snapshot_mse": _surrogate_recompute(problem, params_rel)}
        if b == "tpu":
            vals["fused_mse"] = _surrogate_recompute_fused(problem,
                                                           params_rel)
        _update(rel, "problem", problem, vals)


if __name__ == "__main__":
    main()
