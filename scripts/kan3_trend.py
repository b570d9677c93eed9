"""Beyond-parity depth-3 KAN trend points for the Fig-3C study.

The reference's trend (`trend_plotter.py:7-14`) has d=2 AND d=3 MLP
series but only a d=2 KAN series. These runs add the missing quadrant:
two-hidden-layer [2,w,w,2] KDense chains (grid 5) trained with the same
fast shooting curriculum as the committed d=2 KAN sweep points
(`experiments/sweep.train_point`), reporting the reference-protocol
trajectory train/test MSE. Appends rows (tagged depth=3) to
`sweep_results.json`; resumable — skips sizes already recorded.

One TPU process at a time (CLAUDE.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kanodes_tpu.experiments.sweep import KAN3_SWEEP, train_point

OUT = "sweep_results.json"

with open(OUT) as f:
    results = json.load(f)
done = {(r["model"], r.get("depth") or 2, r["n_params"]) for r in results}

for point in KAN3_SWEEP:
    widths = point.kan_widths()
    n_params = sum(i * o * (point.grid_size + 1)
                   for i, o in zip(widths[:-1], widths[1:]))
    if ("kan", 3, n_params) in done:
        print(f"skip kan3 {n_params}p (already recorded)")
        continue
    # small deep chains are init-sensitive (w=4 seed 0 sticks at ~7.7
    # train MSE; seed 1 reaches 1.1e-6) — retry seeds until converged
    for seed in range(4):
        r = train_point(point, seed=seed)
        if r["train_loss"] < 1e-4 or seed == 3:
            break
        print(f"[kan3] {n_params}p seed {seed} stuck at "
              f"{r['train_loss']:.3e}; retrying", flush=True)
    r["seed"] = seed
    r.pop("params")
    assert r["n_params"] == n_params, (r["n_params"], n_params)
    print(f"[kan3] {r['n_params']}p: train {r['train_loss']:.3e} "
          f"test {r['test_loss']:.3e} in {r['seconds']:.0f}s", flush=True)
    results.append(r)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)

print("done")
