"""FUSED per-member adaptive kernel at S=8 on the v5e.

`ode.odeint_members` (XLA bounded scan) gave the reference-faithful
adaptive protocol (`LV_driver_KANODE.jl:180-184`) to packed ensembles at
8.96x per-member (artifacts/lv_multiseed_adaptive.json). Its remaining
cost is dispatch: every controller iteration is several fusion-group
launches, paid max_steps times per solve. The round-5 fused analogue
(`ops.rk_adaptive_fused.fused_adaptive_members_odeint`) folds the whole
per-member controller loop into ONE forward + ONE backward kernel
launch. This script measures, same-day on one chip:

  1. PARITY at init: fused packed loss/eval vectors vs the XLA packed
     route (same per-member controllers, f32 tolerance).
  2. FIRST-LOAD: wall-clock of the first fused-kernel execution in this
     fresh process (the packed hidden width is S*10=80 — the width
     class where standard-shape Mosaic kernels were measured to pay an
     85-300 s one-time load; recorded honestly either way).
  3. THROUGHPUT: fused packed S=8 vs XLA packed S=8 (warm, median of
     3 repeats of 5k-iteration memoized train chunks), and the implied
     per-member rate vs the sequential single-member baseline stored in
     lv_multiseed_adaptive.json.

Writes artifacts/lv_adaptive_members_fused.json.
Usage: python scripts/lv_adaptive_members_fused.py
One TPU process at a time (CLAUDE.md).
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

from kanodes_tpu.experiments import lv
from kanodes_tpu.models.packed import (apply_mask, block_mask, member_mean,
                                       pack_chain, pack_params, tile_state)
from kanodes_tpu.train.loop import TrainConfig, train

S = 8
ITERS = 5000


def timed_train(loss, params, iters, lr=5e-4):
    tcfg = TrainConfig(lr=lr, iters=iters, eval_every=iters)
    t0 = time.time()
    out = train(loss, params, tcfg, stacked=False)       # warm/compile
    jax.block_until_ready(out["loss_history"])
    first = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.time()
        out = train(loss, params, tcfg, stacked=False)
        jax.block_until_ready(out["loss_history"])
        reps.append(iters / (time.time() - t0))
    return out, sorted(reps)[1], reps, first


def main():
    base = lv.LVConfig(solve_mode="adaptive", max_steps=64,
                       rtol=1e-3, atol=1e-6, adjoint="direct")
    data = lv.make_data(base)
    model = lv.make_model(base)
    members = [jax.tree_util.tree_map(
        lambda x: x * base.init_scale, model.init(jax.random.PRNGKey(s)))
        for s in range(S)]
    packed_model = pack_chain(model, S)
    packed = pack_params(model, members)
    pdata = {"ts": data["ts"], "X": tile_state(data["X"], S),
             "n_train": data["n_train"]}
    mask = block_mask(model, S)

    def make_ploss(impl):
        cfg = dataclasses.replace(base, impl=impl)
        loss_s, eval_s, _ = lv.make_ode_fns(cfg, packed_model, pdata,
                                            reduce_fn=member_mean(S),
                                            n_members=S)
        return (lambda p: loss_s(apply_mask(mask, p)),
                lambda p: eval_s(apply_mask(mask, p)))

    ploss_f, peval_f = make_ploss("fused")
    ploss_x, peval_x = make_ploss("xla")

    # ---- 1. parity at init (+ honest first-execution timing) ----------
    t0 = time.time()
    vec_f = np.asarray(jax.jit(ploss_f)(packed))
    first_exec = round(time.time() - t0, 2)
    print(f"fused members kernel first execution (fresh process): "
          f"{first_exec} s")
    vec_x = np.asarray(jax.jit(ploss_x)(packed))
    evec_f = np.asarray(jax.jit(peval_f)(packed))
    evec_x = np.asarray(jax.jit(peval_x)(packed))
    parity = {
        "max_rel_loss": float(np.max(np.abs(vec_f - vec_x) / vec_x)),
        "max_rel_eval": float(np.max(np.abs(evec_f - evec_x) / evec_x)),
    }
    assert parity["max_rel_loss"] < 3e-5, parity
    assert parity["max_rel_eval"] < 3e-5, parity
    print("parity vs XLA packed:", parity)

    # ---- 2+3. throughput A/B, same day, same process -------------------
    _, fused_its, fused_reps, fused_first = timed_train(
        ploss_f, packed, ITERS)
    _, xla_its, xla_reps, xla_first = timed_train(ploss_x, packed, ITERS)
    print(f"fused packed S=8 adaptive: {fused_its:.0f} it/s "
          f"({8 * fused_its:.0f} member-it/s, first chunk {fused_first:.1f}"
          f" s); XLA packed: {xla_its:.0f} it/s -> fused/xla "
          f"{fused_its / xla_its:.2f}x")

    rec = {
        "date": "2026-08-20", "device": jax.devices()[0].device_kind,
        "S": S, "iters_timed": ITERS,
        "settings": {"max_steps": 64, "rtol": 1e-3, "atol": 1e-6,
                     "solver": "tsit5"},
        "parity_at_init_vs_xla_packed": parity,
        "first_exec_seconds": first_exec,
        "fused_first_train_chunk_seconds": round(fused_first, 2),
        "fused_packed_it_per_s": round(fused_its, 1),
        "fused_reps": [round(r, 1) for r in fused_reps],
        "fused_member_it_per_s": round(8 * fused_its, 1),
        "xla_packed_it_per_s": round(xla_its, 1),
        "xla_reps": [round(r, 1) for r in xla_reps],
        "fused_over_xla": round(fused_its / xla_its, 2),
    }
    seq_path = os.path.join("artifacts", "lv_multiseed_adaptive.json")
    if os.path.exists(seq_path):
        with open(seq_path) as f:
            prev = json.load(f)
        rec["sequential_single_it_per_s"] = prev["sequential_it_per_s"]
        rec["per_member_speedup_vs_sequential"] = round(
            8 * fused_its / prev["sequential_it_per_s"], 2)
        print(f"per-member speedup vs sequential single-member "
              f"({prev['sequential_it_per_s']} it/s, same settings, "
              f"recorded {prev['date']}): "
              f"{rec['per_member_speedup_vs_sequential']}x")

    path = os.path.join("artifacts", "lv_adaptive_members_fused.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
