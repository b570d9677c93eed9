"""Headline benchmark: LV KAN-ODE wall-clock time to the reference loss.

North star (BASELINE.json): "LV KAN-ODE reaches reference loss in <60 s
on one v5e chip". The reference's converged train-horizon MSE for this
architecture ([2,10,2] KAN, grid 5, 240 params) is 8.3e-7 after 1e5 CPU
Adam iterations (`Lotka-Volterra/trend_plotter.py:7-8`).

This bench trains with the TPU-native recipe — multiple-shooting warmup
(fused whole-RK-step Pallas kernels) then multi-step-segment refinement —
and reports the wall-clock seconds of on-device training (compilation
excluded; it is a one-time cost amortized by JAX's persistent cache)
until the full-trajectory train MSE of the reference protocol drops
below 8.3e-7.

    vs_baseline = 60 s / measured_time   (>1 beats the target)

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_LOSS = 8.3e-7     # trend_plotter.py: 240 params -> 8.3e-7
TARGET_SECONDS = 60.0


def main() -> None:
    import optax
    from jax import lax

    from kanodes_tpu.experiments.lv import (LVConfig, make_data, make_model,
                                            init_params, make_ode_fns)

    base = LVConfig()
    data = make_data(base)
    model = make_model(base)
    params0 = init_params(base, model)
    traj_loss_fn, _, _ = make_ode_fns(LVConfig(impl="fused"), model, data)
    traj_loss = jax.jit(traj_loss_fn)

    def make_train(cfg, iters):
        loss_fn, _, _ = make_ode_fns(cfg, model, data)
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
        vg = jax.value_and_grad(loss_fn)

        @jax.jit
        def tr(params, opt_state):
            def step(c, _):
                p, s = c
                l, g = vg(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), l

            (p, s), ls = lax.scan(step, (params, opt_state), None,
                                  length=iters)
            # fold the reference-protocol metric into the same device
            # call: one host round-trip per chunk
            return p, s, ls, traj_loss_fn(p)

        return tr, opt

    CHUNK = 1000
    tr_s1, opt_s1 = make_train(
        LVConfig(solve_mode="shooting", segment_len=1, lr=3e-3,
                 impl="fused"), 5 * CHUNK)
    tr_s4, opt_s4 = make_train(
        LVConfig(solve_mode="shooting", segment_len=4, lr=1e-3,
                 impl="fused"), CHUNK)

    # compile (excluded from the timing; persistent-cached across runs)
    p = params0
    s1 = opt_s1.init(p)
    s4 = opt_s4.init(p)
    jax.block_until_ready(tr_s1(p, s1)[2])
    jax.block_until_ready(tr_s4(p, s4)[2])
    jax.block_until_ready(traj_loss(p))

    # timed: phase A (one 5k-iter shooting call) then phase B (L=4,
    # 1k-iter chunks) until the reference loss falls; the metric rides
    # along in each chunk's device call
    t0 = time.time()
    p, s1, ls, cur = tr_s1(p, s1)
    reached = None
    s4 = opt_s4.init(p)
    s4.hyperparams["learning_rate"] = jnp.asarray(1e-3)
    for chunk in range(30):
        p, s4, ls, cur = tr_s4(p, s4)
        if float(cur) <= REFERENCE_LOSS:
            reached = time.time() - t0
            break
    elapsed = time.time() - t0
    final_loss = float(cur)

    if reached is None:
        # did not reach target: report elapsed with vs_baseline scaled by
        # the loss gap so regressions are visible rather than hidden
        print(json.dumps({
            "metric": "lv_kanode_seconds_to_reference_loss",
            "value": round(elapsed, 2),
            "unit": f"s (NOT reached: loss {final_loss:.2e} "
                    f"> {REFERENCE_LOSS:.1e})",
            "vs_baseline": 0.0,
        }))
        return

    print(json.dumps({
        "metric": "lv_kanode_seconds_to_reference_loss",
        "value": round(reached, 2),
        "unit": "s",
        "vs_baseline": round(TARGET_SECONDS / reached, 2),
    }))


if __name__ == "__main__":
    # the TPU tunnel in this environment occasionally drops mid-run;
    # one retry after a recovery pause salvages those runs
    try:
        main()
    except Exception as e:  # noqa: BLE001
        import sys
        import time as _time

        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); "
              "retrying in 120 s", file=sys.stderr)
        _time.sleep(120)
        main()
