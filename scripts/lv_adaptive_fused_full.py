"""Full-budget reference-faithful adaptive LV run on the fused
whole-adaptive-solve kernels (VERDICT round-3 #4).

Identical regime to `scripts/lv_adaptive_full.py` (adaptive Tsit5
rtol 1e-3 / atol 1e-6, Adam 5e-4, 1e5 iterations, trajectory MSE —
`LV_driver_KANODE.jl:180-184,219-221`) but with the whole bounded
controller loop + its discrete adjoint as ONE Pallas kernel launch each
(`ops/rk_adaptive_fused`). Same gradients as adjoint="direct" by
construction; target >= 3x the XLA path's 361 it/s.

Writes artifacts/lv_adaptive_fused_full.json. One TPU process at a time.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import numpy as np

from kanodes_tpu.experiments.lv import LVConfig, run

TOTAL_ITERS = 100_000

cfg = LVConfig(model="kan", solve_mode="adaptive", impl="fused",
               iters=TOTAL_ITERS, lr=5e-4, rtol=1e-3, atol=1e-6,
               max_steps=64, eval_every=100, max_iters_per_call=10_000)

print(f"[lv_adaptive_fused_full] {cfg.iters} iters", flush=True)
t0 = time.time()
out = run(cfg, verbose=True)
jax.block_until_ready(out["loss_history"])
dt = time.time() - t0

lh = np.asarray(out["loss_history"])
result = {
    "iters_total": int(len(lh)),
    "final_train_mse": float(lh[-1]),
    "best_train_mse": float(lh.min()),
    "final_test_mse": float(out["eval_history"][-1]),
    "wall_s": round(dt, 1),
    "it_per_s": round(cfg.iters / dt, 1),
    "regime": "adaptive tsit5 rtol=1e-3 atol=1e-6, Adam 5e-4, "
              "trajectory MSE, max_steps=64 train / 282 eval, "
              "fused whole-adaptive-solve kernels",
    "xla_baseline": {"it_per_s": 361, "wall_s": 277,
                     "artifact": "artifacts/lv_adaptive_full.json"},
}
print(json.dumps(result))
os.makedirs("artifacts", exist_ok=True)
with open("artifacts/lv_adaptive_fused_full.json", "w") as f:
    json.dump(result, f, indent=1)
