"""Fresh-process first-execution cost of packed-ensemble programs (A/B).

The round-4 finding (CLAUDE.md gotchas): the FIRST execution of a
packed-ensemble training chunk (hidden width 80 through the standard
whole-RK-step kernels) pays an 85-300 s one-time Mosaic kernel load
through the axon tunnel in every fresh process, even on AOT-cache hits
— second call of the same program: 0.4 s. Standard-width kernels load
in seconds. Suspected lever: kernel code size (NEXT_STEPS r4 #1); the
grid-sliced wide-kernel flavor (`ops/rk_fused_wide`, now reachable as
`LVConfig(impl="fused_wide")`) has a much smaller kernel body.

This script measures ONE variant per fresh process (tunnel protocol:
one TPU process at a time, A/B against a control the same day):

    python scripts/packed_load_ab.py control        # width-10 standard
    python scripts/packed_load_ab.py packed_fused   # S=8, standard kernels
    python scripts/packed_load_ab.py packed_wide    # S=8, wide kernels

Each run prints one JSON line: {"variant", "first_s" (compile-or-load +
iters), "second_s" (steady re-dispatch of the same program),
"aot_hit" (whether a serialized executable existed beforehand)}.
Results are appended to artifacts/packed_load_ab.json by --record.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kanodes_tpu.experiments.lv import (LVConfig, init_params, make_data,
                                        make_model, make_ode_fns)
from kanodes_tpu.models.packed import (apply_mask, block_mask, member_mean,
                                       pack_chain, pack_params, tile_state)
from kanodes_tpu.train.loop import (_AOT_DIR, TrainConfig, train)

S = 8
ITERS = int(os.environ.get("AB_ITERS", "200"))


def build(variant: str):
    if variant == "control":
        cfg = LVConfig(solve_mode="shooting", impl="fused")
        data = make_data(cfg)
        model = make_model(cfg)
        params = init_params(cfg, model)
        loss, _, _ = make_ode_fns(cfg, model, data)
        return loss, params
    impl = {"packed_fused": "fused", "packed_wide": "fused_wide"}[variant]
    cfg = LVConfig(solve_mode="shooting", impl=impl)
    data = make_data(cfg)
    model = make_model(cfg)
    members = [jax.tree_util.tree_map(
        lambda x: x * cfg.init_scale, model.init(jax.random.PRNGKey(s)))
        for s in range(S)]
    packed_model = pack_chain(model, S)
    packed = pack_params(model, members)
    pdata = {"ts": data["ts"], "X": tile_state(data["X"], S),
             "n_train": data["n_train"]}
    loss_s, _, _ = make_ode_fns(cfg, packed_model, pdata,
                                reduce_fn=member_mean(S))
    mask = block_mask(model, S)
    return (lambda p: loss_s(apply_mask(mask, p))), packed


def main():
    variant = sys.argv[1]
    loss, params = build(variant)
    n_blobs_before = len(os.listdir(_AOT_DIR)) if os.path.isdir(
        _AOT_DIR) else 0
    tcfg = TrainConfig(lr=3e-3, iters=ITERS, eval_every=ITERS)

    t0 = time.time()
    out = train(loss, params, tcfg, stacked=False)
    jax.block_until_ready(out["loss_history"])
    first = time.time() - t0

    reps = []
    for _ in range(5):
        t1 = time.time()
        out = train(loss, params, tcfg, stacked=False)
        jax.block_until_ready(out["loss_history"])
        reps.append(time.time() - t1)
    second = min(reps)

    n_blobs_after = len(os.listdir(_AOT_DIR)) if os.path.isdir(
        _AOT_DIR) else 0
    rec = {"variant": variant, "iters": ITERS,
           "first_s": round(first, 2), "second_s": round(second, 3),
           "second_reps_s": [round(r, 3) for r in reps],
           "aot_hit": n_blobs_after == n_blobs_before,
           "final_loss_sum": float(jax.numpy.sum(out["loss_history"][-1])),
           "device": jax.devices()[0].device_kind}
    print(json.dumps(rec), flush=True)
    if "--record" in sys.argv:
        path = "artifacts/packed_load_ab.json"
        rows = []
        if os.path.exists(path):
            with open(path) as f:
                rows = json.load(f)
        rows.append(rec)
        with open(path, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
