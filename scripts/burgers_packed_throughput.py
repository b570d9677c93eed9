"""Warm steady-state A/B: packed-5 Burgers train vs single-member train.

The packed Burgers sweep (`scripts/burgers_multiseed_packed.py`) is
end-to-end (first-load + capture + polish); this probe isolates the
TRAIN throughput question from VERDICT r4 #4 — does the packed
per-member win measured at LV sizes carry to the wide [41,10,41]
surrogate chains? Both variants run the same shooting objective through
the same grid-sliced wide kernels (`wide_kernels=True`), same day, same
process; the timed number is the SECOND call of an identical program
(pure re-dispatch — no Mosaic compile or binary load), matching the
steady-state convention of `artifacts/packed_load_ab.json`.

Appends throughput fields into artifacts/burgers_multiseed_packed.json.
Usage: python scripts/burgers_packed_throughput.py
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
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kanodes_tpu.experiments.pde_surrogate import (SurrogateConfig,  # noqa: E402
                                                   make_data, make_fns,
                                                   make_model)
from kanodes_tpu.models.packed import (apply_mask, block_mask,  # noqa: E402
                                       member_mean, pack_chain,
                                       pack_params)
from kanodes_tpu.train.loop import TrainConfig, train  # noqa: E402

OUT = "artifacts/burgers_multiseed_packed.json"
S = 5
ITERS = 10_000


def timed_pair(loss, params, cfg):
    """(first_s, second_s) for two identical train() calls."""
    out = []
    for _ in range(2):
        t0 = time.time()
        r = train(loss, params, cfg)
        jax.block_until_ready(r["params"])
        out.append(round(time.time() - t0, 2))
    return out


def main():
    base = SurrogateConfig(problem="burgers", impl="fused",
                           rk_solver="tsit5", substeps=20,
                           bwd_precision="bf16", wide_kernels=True,
                           max_iters_per_call=2_000)
    data = make_data(base)
    model = make_model(base, data)
    cfg_sh = dataclasses.replace(base, solve_mode="shooting")
    tc = TrainConfig(lr=1e-2, iters=ITERS, eval_every=ITERS,
                     max_iters_per_call=base.max_iters_per_call)

    # control first: certify the tunnel before attributing slowness
    loss_1, _, _ = make_fns(cfg_sh, model, data)
    p1 = model.init(jax.random.PRNGKey(0))
    single_first, single_second = timed_pair(loss_1, p1, tc)
    print(f"single: first {single_first}s second {single_second}s",
          flush=True)

    packed_model = pack_chain(model, S)
    pdata = dataclasses.replace(data, X=np.tile(data.X, (1, S)))
    mask = block_mask(model, S)
    loss_p, _, _ = make_fns(cfg_sh, packed_model, pdata,
                            reduce_fn=member_mean(S))
    vloss = lambda p: loss_p(apply_mask(mask, p))      # noqa: E731
    packed = pack_params(
        model, [model.init(jax.random.PRNGKey(s)) for s in range(S)])
    packed_first, packed_second = timed_pair(vloss, packed, tc)
    print(f"packed: first {packed_first}s second {packed_second}s",
          flush=True)

    per_member = S * single_second / packed_second
    fields = {
        "throughput": {
            "iters": ITERS, "date": "2026-08-19",
            "single_member_s": [single_first, single_second],
            "packed_s": [packed_first, packed_second],
            "single_it_per_s": round(ITERS / single_second, 1),
            "packed_ensemble_it_per_s": round(ITERS / packed_second, 1),
            "packed_member_it_per_s": round(S * ITERS / packed_second, 1),
            "per_member_speedup": round(per_member, 2),
        }
    }
    art = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            art = json.load(f)
    art.update(fields)
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print("wrote", OUT)
    print(json.dumps(fields))


if __name__ == "__main__":
    main()
