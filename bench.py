"""Headline benchmark: LV KAN-ODE training throughput on one chip.

Prints ONE JSON line. The driver-defined north star (BASELINE.json) is
"LV KAN-ODE reaches reference loss in <60 s on one v5e chip"; the
reference's canonical budget for that loss is 1e5 Adam iterations
(LV_driver_KANODE.jl:221). We measure steady-state training iterations/s
of the full jitted pipeline (forward Tsit5 solve over the 35-point train
horizon + reverse AD + Adam update), and report

    vs_baseline = measured_iters_per_sec / (1e5 iters / 60 s)

i.e. >= 1.0 means the canonical training budget fits in the 60-second
target on this chip.
"""

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from kanodes_tpu.experiments.lv import (LVConfig, make_data, make_model,
                                            init_params, make_ode_fns)
    from kanodes_tpu.train.loop import TrainConfig, train

    cfg = LVConfig(iters=2000, eval_every=2000)
    data = make_data(cfg)
    model = make_model(cfg)
    params = init_params(cfg, model)
    loss_fn, eval_fn, _ = make_ode_fns(cfg, model, data)
    tc = TrainConfig(lr=cfg.lr, iters=cfg.iters, eval_every=cfg.eval_every)

    # warmup/compile
    out = train(loss_fn, params, tc, eval_fn=eval_fn)
    jax.block_until_ready(out["loss_history"])

    # timed
    t0 = time.time()
    out = train(loss_fn, params, tc, eval_fn=eval_fn)
    jax.block_until_ready(out["loss_history"])
    dt = time.time() - t0

    iters_per_sec = cfg.iters / dt
    required = 1e5 / 60.0  # canonical budget within the 60 s target
    print(json.dumps({
        "metric": "lv_kanode_train_iters_per_sec",
        "value": round(iters_per_sec, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / required, 4),
    }))


if __name__ == "__main__":
    main()
