"""MFU / roofline measurement for the fused RK kernels (VERDICT r3 #2).

Measures the three production kernel shapes at their experiment
configurations, in-scan (steady-state, no dispatch latency), same-day:

  LV        [2,10,2]      grid 5,  tsit5  — shooting K=34 n=1,
                                            trajectory K=1 n=34
  Schroding [402,10,402]  grid 10, rk4    — shooting K=7 n=24,
                                            trajectory K=1 n=168
  AC 2-D    [1024,10,1024] grid 10, rk4   — shooting K=4 n=24,
                                            trajectory K=1 n=96

FLOP conventions (stated in the table; GEMM FLOPs only, 2mnk):
  * fwd rows: EXACT algorithmic forward FLOPs of the kernel's GEMMs.
  * grad rows: MODEL FLOPs = 3x forward (the standard MFU convention);
    the backward kernels recompute stages, so hardware FLOPs are higher
    and the reported MFU is correspondingly conservative/honest.
  * peaks: v5e ~197 TFLOP/s bf16; exact-f32 runs 6-pass MXU emulation
    (Precision.HIGHEST), effective ceiling 197/6 = 32.8 TFLOP/s. Each
    row reports % of the ceiling matching its dot precision (forward is
    always exact f32; grad rows use the bwd_precision of the row).

Writes artifacts/mfu_bench.json + prints a markdown table.
One TPU process at a time; ~20 min cold (Mosaic compiles), ~2 min warm.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp
import numpy as np

from kanodes_tpu.ode.tableaus import get_tableau
from kanodes_tpu.ops.kdense_pallas import ChainSpec
from kanodes_tpu.ops.rk_fused import (_needed_stages, fused_rk_step,
                                      fused_rk_multistep)
from kanodes_tpu.ops.rk_fused_wide import WideSpec, fused_rk_multistep_wide

PEAK_BF16 = 197.0e12          # v5e MXU peak, bf16
PEAK_F32 = PEAK_BF16 / 6.0    # Precision.HIGHEST = 6-pass emulation


def narrow_chain_flops(spec: ChainSpec, K: int) -> int:
    I, H, O, G = spec.in_dims, spec.hidden, spec.out_dims, spec.grid_len
    IG, HG = I * G, H * G
    return 2 * K * (I * IG + IG * H + I * H + H * HG + HG * O + H * O)


def wide_chain_flops(ws: WideSpec, K: int) -> int:
    HG = ws.H * ws.G
    l1 = 2 * K * (ws.Ipad * ws.H * ws.G + ws.Ipad * ws.H)
    l2 = 2 * K * (ws.H * HG + HG * ws.Opad + ws.H * ws.Opad)
    return l1 + l2


def rand_params(key, spec: ChainSpec):
    ks = jax.random.split(key, 4)
    I, H, O, G = spec.in_dims, spec.hidden, spec.out_dims, spec.grid_len
    return (0.1 * jax.random.normal(ks[0], (I * G, H)),
            0.1 * jax.random.normal(ks[1], (I, H)),
            0.1 * jax.random.normal(ks[2], (H * G, O)),
            0.1 * jax.random.normal(ks[3], (H, O)))


def timeit_scan(make_body, c1, n_scan, reps=3):
    """Steady-state time per body call: lax.scan of n_scan calls with the
    carry threaded through the c1 parameter (prevents loop hoisting)."""
    @jax.jit
    def f(c1):
        _, out = jax.lax.scan(make_body, c1, None, length=n_scan)
        return out

    r = f(c1)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(c1)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / n_scan


def bench_case(name, kind, spec_or_ws, solver, K, n_steps, n_scan):
    """Returns rows for fwd / grad(highest) / grad(bf16)."""
    tab = get_tableau(solver)
    live = sum(_needed_stages(tab))
    rows = []
    if kind == "narrow":
        spec = spec_or_ws
        c1, w1, c2, w2 = rand_params(jax.random.PRNGKey(0), spec)
        x0 = 0.5 * jnp.ones((K, spec.in_dims), jnp.float32)
        chain_f = narrow_chain_flops(spec, K)

        def solve(c1_, bwd):
            if n_steps == 1:
                return fused_rk_step(spec, solver, 0.1, x0, c1_, w1,
                                     c2, w2, None, bwd)[None]
            return fused_rk_multistep(spec, solver, 0.1, n_steps, x0,
                                      c1_, w1, c2, w2, None, bwd)
    else:
        ws = spec_or_ws
        spec = ws.spec
        c1, w1, c2, w2 = rand_params(jax.random.PRNGKey(0), spec)
        c1p, w1p, c2p, w2p = ws.pad_params(c1, w1, c2, w2)
        c1 = c1p
        x0 = jnp.pad(0.5 * jnp.ones((K, ws.I), jnp.float32),
                     ((0, 0), (0, ws.Ipad - ws.I)))
        chain_f = wide_chain_flops(ws, K)

        def solve(c1_, bwd):
            return fused_rk_multistep_wide(ws, solver, 1e-4, n_steps,
                                           x0, c1_, w1p, c2p, w2p,
                                           None, None, bwd)

    fwd_flops = live * chain_f * n_steps
    evals = live * n_steps * K

    def fwd_body(c, _):
        ys = solve(c, "highest")
        s = jnp.sum(ys)
        return c + 1e-20 * s, s

    t_fwd = timeit_scan(fwd_body, c1, n_scan)
    rows.append(dict(case=name, mode="fwd", K=K, n_steps=n_steps,
                     solver=solver, us=t_fwd * 1e6,
                     flops=fwd_flops,
                     tflops=fwd_flops / t_fwd / 1e12,
                     pct_peak=100 * fwd_flops / t_fwd / PEAK_F32,
                     peak_ref="f32emu",
                     evals_per_s=evals / t_fwd))
    print(f"  {name:10s} fwd          {t_fwd*1e6:9.1f} us  "
          f"{fwd_flops/t_fwd/1e12:7.3f} TF/s "
          f"({100*fwd_flops/t_fwd/PEAK_F32:5.1f}% f32emu)", flush=True)

    for bwd in ("highest", "bf16"):
        def loss(c1_):
            return jnp.sum(solve(c1_, bwd) ** 2)

        def grad_body(c, _):
            g = jax.grad(loss)(c)
            s = jnp.sum(g)
            return c + 1e-20 * s, s

        t_g = timeit_scan(grad_body, c1, n_scan)
        model_flops = 3 * fwd_flops
        peak = PEAK_F32 if bwd == "highest" else PEAK_BF16
        rows.append(dict(case=name, mode=f"grad/{bwd}", K=K,
                         n_steps=n_steps, solver=solver, us=t_g * 1e6,
                         flops=model_flops,
                         tflops=model_flops / t_g / 1e12,
                         pct_peak=100 * model_flops / t_g / peak,
                         peak_ref="f32emu" if bwd == "highest"
                         else "bf16",
                         evals_per_s=3 * evals / t_g))
        print(f"  {name:10s} grad/{bwd:7s} {t_g*1e6:9.1f} us  "
              f"{model_flops/t_g/1e12:7.3f} TF/s "
              f"({100*model_flops/t_g/peak:5.1f}% {rows[-1]['peak_ref']})",
              flush=True)
    return rows


def main():
    lv = ChainSpec(2, 10, 2, 5)
    schr = WideSpec(ChainSpec(402, 10, 402, 10, normalizer="softsign"))
    ac2d = WideSpec(ChainSpec(1024, 10, 1024, 10, normalizer="softsign"))

    t_day = time.strftime("%Y-%m-%d")
    all_rows = []
    print(f"[mfu_bench] {t_day} on {jax.devices()[0].device_kind}",
          flush=True)
    all_rows += bench_case("lv-shoot", "narrow", lv, "tsit5", 34, 1, 400)
    all_rows += bench_case("lv-traj", "narrow", lv, "tsit5", 1, 34, 100)
    all_rows += bench_case("schr-shoot", "wide", schr, "rk4", 7, 24, 100)
    all_rows += bench_case("schr-traj", "wide", schr, "rk4", 1, 168, 30)
    all_rows += bench_case("ac2d-shoot", "wide", ac2d, "rk4", 4, 24, 60)
    all_rows += bench_case("ac2d-traj", "wide", ac2d, "rk4", 1, 96, 30)

    out = {"date": t_day, "device": jax.devices()[0].device_kind,
           "peak_bf16_tflops": PEAK_BF16 / 1e12,
           "peak_f32emu_tflops": PEAK_F32 / 1e12,
           "conventions": "fwd rows exact GEMM FLOPs; grad rows MODEL "
                          "FLOPs (3x fwd); pct_peak vs the row's dot "
                          "precision ceiling",
           "rows": all_rows}
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/mfu_bench.json", "w") as f:
        json.dump(out, f, indent=1)

    print("\n| case | mode | K | steps | us/solve | TFLOP/s | % peak "
          "(ref) | chain evals/s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in all_rows:
        print(f"| {r['case']} | {r['mode']} | {r['K']} | {r['n_steps']} "
              f"| {r['us']:.1f} | {r['tflops']:.3f} | "
              f"{r['pct_peak']:.1f}% ({r['peak_ref']}) | "
              f"{r['evals_per_s']:.3g} |")


if __name__ == "__main__":
    main()
