"""2-D Allen-Cahn gray-box source recovery at the 1-D reference budget
(beyond parity — `Allen-Cahn_Source.jl:38-66,164` is 1-D).

Trains du/dt = -D*lap2d(u) + kan.(u) on 101 snapshots of the 32x32
periodic truth on the Kronecker-factored fused kernel for the
reference's 5e4 Adam(1e-2) budget plus a small-lr continuation, then
recovers the hidden reaction with both symbolic engines.
Writes artifacts/ac2d_full.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from kanodes_tpu.experiments.pde_source import (SourceConfig,  # noqa: E402
                                                make_data, make_fns,
                                                make_model, recover_source)
from kanodes_tpu.train.loop import TrainConfig, train  # noqa: E402

OUT = "artifacts/ac2d_full.json"
PHASES = [(1e-2, 50_000),       # the reference budget
          (1e-3, 6_000),        # continuation: settle the minimum
          (1e-4, 4_000)]


def main():
    cfg = SourceConfig(problem="allen_cahn", ndim=2, eval_every=500,
                       impl="fused")
    data = make_data(cfg)
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(cfg.seed))
    loss_fn, _, _ = make_fns(cfg, model, data)

    t0 = time.time()
    opt_state = None
    best = (float("inf"), params)
    history = []
    for lr, iters in PHASES:
        if opt_state is not None:
            opt_state = opt_state._replace(hyperparams={
                **opt_state.hyperparams,
                "learning_rate": jnp.asarray(lr, jnp.float32)})
        tc = TrainConfig(lr=lr, iters=iters, eval_every=cfg.eval_every,
                         max_iters_per_call=cfg.resolved_chunk())
        out = train(loss_fn, params, tc, opt_state=opt_state)
        params, opt_state = out["params"], out["opt_state"]
        if float(out["best_loss"]) < best[0]:
            best = (float(out["best_loss"]), out["best_params"])
        history.append({"lr": lr, "iters": iters,
                        "final": float(out["loss_history"][-1]),
                        "best": float(out["best_loss"])})
        print(history[-1], flush=True)
    jax.block_until_ready(params)
    train_s = time.time() - t0

    rec_in = {"model": model, "best_params": best[1], "data": data}
    t1 = time.time()
    rec_sindy = recover_source(rec_in, method="sindy")
    sindy_s = time.time() - t1
    t1 = time.time()
    rec_gp = recover_source(rec_in, generations=250, seed=0)
    gp_s = time.time() - t1

    rec = {
        "grid": "32x32 periodic (1024 cells)",
        "phases": history,
        "best_train": best[0],
        "train_seconds": round(train_s, 1),
        "it_per_s": round(sum(i for _, i in PHASES) / train_s, 1),
        "recovered_gp": rec_gp["pretty"],
        "gp_seconds": round(gp_s, 2),
        "recovered_sindy": rec_sindy["pretty"],
        "sindy_seconds": round(sindy_s, 3),
        "truth": "5.0*x0 - 5.0*x0**3",
        "state_range": [float(v) for v in rec_sindy["range"]],
    }
    print(json.dumps(rec, indent=1))
    os.makedirs("artifacts", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
