"""A/B: low-rank step-Jacobian backward vs stage-chain backward on the
Schrödinger-shaped trajectory workload (K=1, one 300-step multistep
launch per iteration — the K=1 floor documented in NEXT_STEPS #1).

Same-process, same-day measurement (tunnel-day variance is +-40%);
in-jit scan of 20 grad evaluations with a forced host fetch, per the
measurement notes in NEXT_STEPS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
import numpy as np

from kanodes_tpu.models import KANChain
from kanodes_tpu.ops.kdense_pallas import fused_params
from kanodes_tpu.ops.rk_fused_wide import (wide_chain_adapter,
                                           fused_rk_multistep_wide)

SOLVER = sys.argv[1] if len(sys.argv) > 1 else "rk4"
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 300
SCAN = 20

chain = KANChain.mlp_like([402, 10, 402], grid_len=10,
                          normalizer="softsign")
params = jax.tree_util.tree_map(
    lambda a: a * 0.1, chain.init(jax.random.PRNGKey(0)))
ws, _ = wide_chain_adapter(chain, solver=SOLVER)
pp = ws.pad_params(*fused_params(params))
x0 = jnp.pad(jnp.asarray(np.random.default_rng(0).normal(
    0, 0.2, (1, 402)), jnp.float32), ((0, 0), (0, ws.Ipad - 402)))
dt = 1e-3
snap = np.linspace(0, N_STEPS - 1, 8).astype(int)


def make(lr_flag):
    def loss(pp):
        ys = fused_rk_multistep_wide(ws, SOLVER, dt, N_STEPS, x0, *pp,
                                     None, lr_flag)
        return jnp.mean(ys[snap] ** 2)

    @jax.jit
    def bench(pp):
        def body(c, _):
            l, g = jax.value_and_grad(loss)(c)
            c = jax.tree_util.tree_map(lambda p, gi: p - 1e-9 * gi, c, g)
            return c, l
        c, ls = jax.lax.scan(body, pp, None, length=SCAN)
        return ls[-1], c[0][0, 0]

    return bench


for name, flag in (("stage-chain", False), ("lowrank", True)):
    bench = make(flag)
    t0 = time.time()
    l, probe = bench(pp)
    l.block_until_ready()
    print(f"[{name}] compile+first: {time.time()-t0:.1f}s "
          f"loss {float(l):.6e}", flush=True)
    times = []
    for _ in range(5):
        t0 = time.time()
        l, probe = bench(pp)
        _ = float(l) + float(probe)          # forced host fetch
        times.append(time.time() - t0)
    best = min(times)
    per_iter = best / SCAN
    per_step = per_iter / N_STEPS * 1e6
    print(f"[{name}] best {best*1e3:.1f} ms / {SCAN} iters -> "
          f"{1/per_iter:.0f} it/s, {per_step:.2f} us/step (fwd+bwd)",
          flush=True)
