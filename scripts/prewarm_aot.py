"""Prewarm the cross-process AOT executable cache for every standard
experiment configuration (NEXT_STEPS #2, last mile).

On this machine each FRESH process pays the Mosaic remote compile for
every Pallas-bearing jit (~38-70 s per fused training chunk) even with
a warm XLA disk cache: the cost is server-side in `.compile()`.
`train.loop._aot_compile` removes it by caching serialized executables
keyed by scrubbed-jaxpr + closure constants — but only for chunks that
have been compiled ONCE on the machine. This script does that once for
all standard configs, without executing a single training step
(`train(..., compile_only=True)`), so every later fresh process —
experiment CLIs, full-budget scripts, bench.py — starts from a warm
executable cache.

Run once per machine / JAX upgrade / kernel change:

    python scripts/prewarm_aot.py            # everything (~5-10 min cold)
    python scripts/prewarm_aot.py lv bench   # subset of groups

Groups: surrogate, source, lv, bench. The config tables below mirror
the budget scripts (`scripts/surrogate_full.py`,
`kanodes_tpu/experiments/pde_source.py __main__`,
`scripts/bspline_lv_full.py`, `scripts/lv_adaptive_full.py`, bench.py);
drift between them and this file only costs a cache miss, never a
stale hit (the AOT key covers program text AND baked-in data).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from kanodes_tpu.train.loop import TrainConfig, train  # noqa: E402

GROUPS = set(sys.argv[1:]) or {"surrogate", "source", "lv", "packed",
                               "bench"}
REPORT = []


def _unit(tag, fn):
    t0 = time.time()
    try:
        ok = fn()
    except Exception as e:  # noqa: BLE001 — keep warming the rest
        print(f"[prewarm] {tag}: FAILED ({type(e).__name__}: {e})",
              flush=True)
        REPORT.append((tag, "failed", time.time() - t0))
        return
    dt = time.time() - t0
    state = "cached" if ok else "no-aot (cpu backend or serialize failed)"
    print(f"[prewarm] {tag}: {state} in {dt:.1f}s", flush=True)
    REPORT.append((tag, state, dt))


def surrogate_units():
    from kanodes_tpu.experiments.pde_surrogate import (SurrogateConfig,
                                                       make_data, make_fns,
                                                       make_model)

    # mirrors scripts/surrogate_full.py: fused tsit5, substeps 20,
    # chunk 2000 / eval 500 -> one chunk shape per (problem, mode)
    for problem in ("schrodinger", "allen_cahn", "burgers",
                    "allen_cahn_2d"):
        base = SurrogateConfig(problem=problem, impl="fused",
                               rk_solver="tsit5", substeps=20,
                               bwd_precision="highest",
                               max_iters_per_call=2_000, eval_every=500)
        data = make_data(base)
        model = make_model(base, data)
        params = model.init(jax.random.PRNGKey(base.seed))
        for mode in ("shooting", "fixed"):
            cfg_m = dataclasses.replace(base, solve_mode=mode)
            train_loss, eval_loss, _ = make_fns(cfg_m, model, data)
            tc = TrainConfig(lr=1e-3, iters=2_000, eval_every=500,
                             max_iters_per_call=2_000)

            def go(train_loss=train_loss, eval_loss=eval_loss, tc=tc,
                   params=params):
                out = train(train_loss, params, tc, eval_fn=eval_loss,
                            compile_only=True)
                return out["aot_compiled"]

            _unit(f"surrogate/{problem}/{mode}", go)


def source_units():
    from kanodes_tpu.experiments.pde_source import (SourceConfig, make_data,
                                                    make_fns, make_model)

    # mirrors pde_source __main__ (full reference budgets, fused kernel)
    # + the 2-D configs of scripts/source2d_full.py
    units = [
        SourceConfig(problem="fisher_kpp", iters=20_000,
                     eval_every=5_000, impl="fused"),
        SourceConfig(problem="allen_cahn", iters=50_000,
                     eval_every=5_000, impl="fused"),
        SourceConfig(problem="fisher_kpp", ndim=2, iters=20_000,
                     eval_every=500, impl="fused"),
        SourceConfig(problem="allen_cahn", ndim=2, iters=50_000,
                     eval_every=500, impl="fused"),
    ]
    for cfg in units:
        data = make_data(cfg)
        model = make_model(cfg)
        params = model.init(jax.random.PRNGKey(cfg.seed))
        loss_fn, _, _ = make_fns(cfg, model, data)
        tc = TrainConfig(lr=cfg.lr, iters=cfg.iters,
                         eval_every=cfg.eval_every,
                         max_iters_per_call=cfg.resolved_chunk())

        def go(loss_fn=loss_fn, tc=tc, params=params):
            # pde_source.run() trains WITHOUT an eval_fn — match it
            out = train(loss_fn, params, tc, compile_only=True)
            return out["aot_compiled"]

        tag = f"source/{cfg.problem}" + ("_2d" if cfg.ndim == 2 else "")
        _unit(tag, go)


def lv_units():
    from kanodes_tpu.experiments.lv import (LVConfig, init_params,
                                            make_data, make_model,
                                            make_ode_fns)

    units = [
        # fused flagship modes (EXPERIMENTS.md recipe phases)
        ("lv/fused_shooting_L1",
         LVConfig(solve_mode="shooting", segment_len=1, impl="fused")),
        ("lv/fused_shooting_L4",
         LVConfig(solve_mode="shooting", segment_len=4, impl="fused")),
        ("lv/fused_trajectory", LVConfig(solve_mode="fixed", impl="fused")),
        # reference-faithful adaptive (scripts/lv_adaptive_full.py)
        ("lv/adaptive_direct",
         LVConfig(model="kan", solve_mode="adaptive", impl="xla",
                  iters=5_000, lr=5e-4, rtol=1e-3, atol=1e-6, max_steps=64,
                  eval_every=100, max_iters_per_call=5_000)),
        # PyTorch-protocol bspline flavors (scripts/bspline_lv_full.py)
        ("lv/bspline_direct",
         LVConfig(model="bspline_kan", iters=10_000, lr=2e-3,
                  eval_every=500, solve_mode="fixed", substeps=2)),
        ("lv/bspline_interpolating",
         LVConfig(model="bspline_kan", iters=2_000, lr=2e-3, eval_every=500,
                  solve_mode="adaptive", adjoint="interpolating",
                  rtol=1e-6, atol=1e-8, max_steps=96,
                  max_iters_per_call=2_000)),
    ]
    for tag, cfg in units:
        data = make_data(cfg)
        model = make_model(cfg)
        params = init_params(cfg, model)
        loss_fn, eval_fn, _ = make_ode_fns(cfg, model, data)
        tc = TrainConfig(lr=cfg.lr, iters=cfg.iters,
                         eval_every=cfg.eval_every,
                         max_iters_per_call=cfg.max_iters_per_call)

        def go(loss_fn=loss_fn, eval_fn=eval_fn, tc=tc, params=params):
            out = train(loss_fn, params, tc, eval_fn=eval_fn,
                        compile_only=True)
            return out["aot_compiled"]

        _unit(tag, go)


def packed_units():
    """The packed 8-seed LV ensemble chunks
    (scripts/lv_multiseed_packed.py). NOTE: prewarming removes the
    ~130 s Mosaic compile for fresh machines, but a fresh PROCESS still
    pays the one-time packed-kernel LOAD on first execution
    (CLAUDE.md environment gotchas)."""
    from kanodes_tpu.experiments import lv
    from kanodes_tpu.models.packed import (apply_mask, block_mask,
                                           member_mean, pack_chain,
                                           pack_params, tile_state)

    S = 8
    base = lv.LVConfig(impl="fused", basis="iqf")
    data = lv.make_data(base)
    model = lv.make_model(base)
    packed_model = pack_chain(model, S)
    pdata = {"ts": data["ts"], "X": tile_state(data["X"], S),
             "n_train": data["n_train"]}
    mask = block_mask(model, S)
    packed = pack_params(
        model, [lv.init_params(base, model, key=jax.random.PRNGKey(s))
                for s in range(S)])
    # the sweep's three distinct (mode, L, iters) chunk programs
    for tag, mode, L, iters in (("packed/shooting_L1", "shooting", 1,
                                 10_000),
                                ("packed/shooting_L4", "shooting", 4,
                                 6_000),
                                ("packed/fixed", "fixed", 0, 7_000)):
        loss_s, _, _ = lv.make_ode_fns(
            dataclasses.replace(base, solve_mode=mode,
                                segment_len=max(L, 1)),
            packed_model, pdata, reduce_fn=member_mean(S))
        tc = TrainConfig(lr=1e-3, iters=iters, eval_every=iters)

        def go(loss_s=loss_s, tc=tc):
            out = train(lambda p, f=loss_s: f(apply_mask(mask, p)),
                        packed, tc, compile_only=True)
            return out["aot_compiled"]

        _unit(tag, go)


def bench_units():
    import bench

    def go():
        b = bench.build()  # build() itself AOT-compiles its 4 programs
        status = b.get("aot_status", {})
        return len(status) == 4 and all(status.values())

    _unit("bench/programs", go)


if __name__ == "__main__":
    t0 = time.time()
    if "surrogate" in GROUPS:
        surrogate_units()
    if "source" in GROUPS:
        source_units()
    if "lv" in GROUPS:
        lv_units()
    if "packed" in GROUPS:
        packed_units()
    if "bench" in GROUPS:
        bench_units()
    n_ok = sum(1 for _, s, _ in REPORT if s == "cached")
    print(f"[prewarm] {n_ok}/{len(REPORT)} units cached "
          f"in {time.time() - t0:.1f}s total")
