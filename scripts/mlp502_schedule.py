"""502-param MLP-NODE baseline, 1e5-iter budget with lr decay.

The constant-Adam(1e-2) reference regime (`LV_driver_MLP.jl:92-97`)
plateaus noisily at ~6.5e-5 for the 502-param MLP on this stack
(artifacts/mlp_full_budget.json); the reference reports 1.6e-5. Same
budget, staged lr (1e-2 -> 1e-3 -> 2e-4) — an equal-work training
schedule — to reach/beat the reference number honestly.
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

PHASES = [(1e-2, 50_000), (1e-3, 30_000), (2e-4, 20_000)]
base = LVConfig(model="mlp", mlp_widths=(2, 100, 2), init_scale=1.0,
                solve_mode="adaptive", impl="xla", rtol=1e-3, atol=1e-6,
                max_steps=64, eval_every=500, max_iters_per_call=5_000)

params = None
hists = []
t0 = time.time()
for lr, iters in PHASES:
    cfg = dataclasses.replace(base, lr=lr, iters=iters)
    print(f"[mlp502] lr={lr} iters={iters}", flush=True)
    out = run(cfg, params=params)
    jax.block_until_ready(out["loss_history"])
    params = out["params"]
    hists.append(np.asarray(out["loss_history"]))
    print(f"  -> final {hists[-1][-1]:.3e} best {hists[-1].min():.3e} "
          f"test {float(out['eval_history'][-1]):.3e}", flush=True)
dt = time.time() - t0

hist = np.concatenate(hists)
rec = {"hidden": 100, "iters": int(len(hist)),
       "final_train_mse": float(hist[-1]),
       "best_train_mse": float(hist.min()),
       "final_test_mse": float(out["eval_history"][-1]),
       "reference_train_mse": 1.6e-5,
       "beats_reference": bool(hist.min() <= 1.6e-5),
       "wall_s": round(dt, 1),
       "regime": "adaptive tsit5 rtol=1e-3, Adam 1e-2->1e-3->2e-4 "
                 "(equal 1e5-iter budget), trajectory MSE"}
print(json.dumps(rec))
with open("artifacts/mlp_full_budget.json") as f:
    results = json.load(f)
results["502"] = rec
with open("artifacts/mlp_full_budget.json", "w") as f:
    json.dump(results, f, indent=1)
