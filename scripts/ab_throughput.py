"""Same-day A/B re-measurement of every headline it/s claim (VERDICT r3 #7).

Cross-day throughput numbers on this machine carry a measured ~±40%
tunnel-day error bar (EXPERIMENTS.md round-3 notes). This script
re-measures ALL headline training throughputs in ONE process on ONE
day, steady-state (warm executable, timed repeats, spread reported):

  lv-shooting      fused whole-RK-step kernels    (claimed 35.7k it/s)
  lv-trajectory    single-launch multistep        (claimed 3.2-3.7k)
  lv-adaptive      whole-adaptive-solve kernels   (claimed 2.4k)
  schr-shooting    wide rk4@24 bf16-bwd           (claimed 1425-1903)
  schr-trajectory  wide single-launch + lowrank   (claimed 559)
  ac2d-shooting    1024-wide rk4@24 bf16-bwd      (claimed 826-916)
  ac2d-trajectory  1024-wide single-launch        (claimed 622)

Protocol per case: build the driver's real loss/eval closures once
(`make_fns`), run one warm-up train() call (compile/AOT load), then 3
timed train() calls on the SAME memoized chunk; report it/s min/med/max.
Writes artifacts/ab_throughput.json. One TPU process at a time.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import numpy as np

from kanodes_tpu.train.loop import TrainConfig, train

RESULTS = {}


def measure(name, loss_fn, eval_fn, iters, claimed, reps=3,
            eval_every=500):
    tc = TrainConfig(lr=1e-3, iters=iters, eval_every=eval_every,
                     max_iters_per_call=iters)
    out = train(loss_fn, None_params[name], tc, eval_fn=eval_fn)
    jax.block_until_ready(out["loss_history"])          # warm-up
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = train(loss_fn, out["params"], tc, eval_fn=eval_fn)
        jax.block_until_ready(out["loss_history"])
        rates.append(iters / (time.perf_counter() - t0))
    rates.sort()
    row = {"it_per_s": {"min": round(rates[0], 1),
                        "med": round(rates[len(rates) // 2], 1),
                        "max": round(rates[-1], 1)},
           "iters_per_rep": iters, "reps": reps, "claimed": claimed}
    RESULTS[name] = row
    print(f"{name:16s} {row['it_per_s']['min']:>8.0f} / "
          f"{row['it_per_s']['med']:>8.0f} / "
          f"{row['it_per_s']['max']:>8.0f} it/s   (claimed {claimed})",
          flush=True)


None_params = {}


def lv_case(name, iters, claimed, **kw):
    from kanodes_tpu.experiments.lv import (LVConfig, make_data,
                                            make_model, init_params,
                                            make_ode_fns)
    cfg = LVConfig(impl="fused", **kw)
    data = make_data(cfg)
    model = make_model(cfg)
    None_params[name] = init_params(cfg, model)
    loss_fn, eval_fn, _ = make_ode_fns(cfg, model, data)
    measure(name, loss_fn, eval_fn, iters, claimed)


def surrogate_case(name, problem, mode, iters, claimed):
    from kanodes_tpu.experiments.pde_surrogate import (SurrogateConfig,
                                                       make_data,
                                                       make_model,
                                                       make_fns)
    cfg = SurrogateConfig(problem=problem, solve_mode=mode, impl="fused",
                          rk_solver="rk4", substeps=24,
                          bwd_precision="bf16")
    data = make_data(cfg)
    model = make_model(cfg, data)
    None_params[name] = model.init(jax.random.PRNGKey(0))
    loss_fn, eval_fn, _ = make_fns(cfg, model, data)
    measure(name, loss_fn, eval_fn, iters, claimed)


def main():
    day = time.strftime("%Y-%m-%d")
    print(f"[ab_throughput] {day} on {jax.devices()[0].device_kind}",
          flush=True)

    lv_case("lv-shooting", 15_000, "35.7k",
            solve_mode="shooting", segment_len=1)
    lv_case("lv-trajectory", 10_000, "3.2-3.7k", solve_mode="fixed")
    lv_case("lv-adaptive", 10_000, "2.4k",
            solve_mode="adaptive", max_steps=64, rtol=1e-3, atol=1e-6)
    surrogate_case("schr-shooting", "schrodinger", "shooting", 3_000,
                   "1425-1903")
    surrogate_case("schr-trajectory", "schrodinger", "fixed", 1_500,
                   "559")
    surrogate_case("ac2d-shooting", "allen_cahn_2d", "shooting", 2_000,
                   "826-916")
    surrogate_case("ac2d-trajectory", "allen_cahn_2d", "fixed", 1_500,
                   "622")

    out = {"date": day, "device": jax.devices()[0].device_kind,
           "protocol": "steady-state: warm train() call discarded, 3 "
                       "timed repeats of the memoized chunk, "
                       "eval_every=500",
           "cases": RESULTS}
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/ab_throughput.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
