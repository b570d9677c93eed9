"""Strain-limiting KAN-PINN training orchestration.

Rebuild of `train_model` (`StrainLimiting_KAN_PINN.py:1581-1982`) and the
Julia `train!`/`train_stage!` (`StrainLimiting_KAN_PINN.jl:463-691`):

  * two stages (Adam 3e-4 then finetune 5e-5) with early stopping;
  * PDE-weight curriculum: 0 for `pretrain_epochs`, then linear ramp to 1
    over `pde_ramp_epochs` (:1077-1085);
  * fresh stratified collocation batches every epoch + adaptive top-k
    residual resampling (:400-431);
  * composite loss  lambda_pde*w(t)*pde + lambda_bc*bc + lambda_gauge*g
    + lambda_sym*sym + lambda_tip*tip + lambda_tip_ratio*hinge
    (:1706-1726), global-norm grad clip 1.0 (:1727);
  * fixed validation sets, validated every N epochs with physics-aware
    model selection (pde term floored at weight 0.25, :1732-1799);
  * checkpoint/resume via the shared Checkpointer.

TPU-native shape: the entire epoch (loss + grad + clip + Adam) is ONE
jitted step with static batch shapes; host work is only the NumPy
samplers. The reference's chunked streaming backward + OOM-halving
ladders (:885-1074) have no equivalent here — XLA's memory plan is
static and the whole batch fits.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kanodes_tpu.pinn import geometry as G
from kanodes_tpu.pinn import losses as L
from kanodes_tpu.pinn.model import KANPINN

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PINNConfig:
    """TrainParams parity (StrainLimiting_KAN_PINN.py:92-181) with the
    Julia flavor reachable via preset()."""
    # model
    widths: tuple[int, ...] = (2, 96, 96, 96, 1)
    n_basis: int = 48
    trainable_centers: bool = True
    residual: str = "autograd"         # autograd | fd (Julia flavor)
    fd_eps: float = 2e-3
    # epochs
    adam_epochs: int = 8000
    finetune_epochs: int = 8000
    pretrain_epochs: int = 1000
    pde_ramp_epochs: int = 3500
    # batch counts (:97-101)
    n_interior_uniform: int = 256
    n_interior_refine: int = 256
    n_interior_tip_strip: int = 1536
    n_interior_tip_annulus: int = 768
    n_boundary_each: int = 128
    n_adaptive: int = 0                # extra top-|r| points per epoch
    adaptive_candidates: int = 2048
    # validation counts (:103-108)
    val_n_interior_uniform: int = 256
    val_n_interior_refine: int = 256
    val_n_interior_tip_strip: int = 2048
    val_n_interior_tip_annulus: int = 1024
    val_n_boundary_each: int = 128
    # loss weights (:110-116)
    lambda_bc: float = 10.0
    lambda_gauge: float = 0.01
    lambda_sym: float = 0.5
    lambda_pde: float = 1.0
    lambda_tip: float = 0.02
    lambda_tip_ratio: float = 1.0
    # tip machinery (:118-122)
    tip_stress_c: float = 0.25
    tip_ratio_target: float = 1.2
    tip_weight_power: float = 0.5
    tip_loss_r_weight_power: float = 0.5
    # optimization (:123-124)
    learning_rate: float = 3e-4
    finetune_lr: float = 5e-5
    grad_clip: float = 1.0
    # cadence (:126-131)
    validation_every: int = 10
    checkpoint_every: int = 0          # 0 = off
    # data parallelism: shard every collocation/boundary batch axis over
    # a dp-device mesh (params replicated, XLA inserts the psums for the
    # mean reductions and the gather for the adaptive top-k). 0/1 = off.
    # The reference has no distributed story (SURVEY.md §2.9); this is
    # the TPU-native scale-out for residual batches too big for one chip.
    dp: int = 0
    early_stop_patience: int = 99999
    min_improve: float = 1e-5
    seed: int = 42
    notch_face_bc_mode: str = "natural"   # natural | exclude | dirichlet_zero

    @classmethod
    def julia_small(cls) -> "PINNConfig":
        """The Julia flavor (`StrainLimiting_KAN_PINN.jl:50-58,409-419`):
        [2,32,32,1], 16 bases, fixed centers, FD residual, losses
        pde + 20 bc + 1e-3 gauge."""
        return cls(widths=(2, 32, 32, 1), n_basis=16,
                   trainable_centers=False, residual="fd",
                   lambda_bc=20.0, lambda_gauge=1e-3, lambda_sym=0.0,
                   lambda_tip=0.0, lambda_tip_ratio=0.0,
                   tip_weight_power=0.0, pretrain_epochs=0,
                   pde_ramp_epochs=1, grad_clip=10.0, learning_rate=1e-3,
                   finetune_lr=2e-4,
                   n_interior_tip_strip=256, n_interior_tip_annulus=0,
                   val_n_interior_tip_strip=256,
                   val_n_interior_tip_annulus=0)


def _dirichlet_labels(cfg: PINNConfig) -> tuple[str, ...]:
    if cfg.notch_face_bc_mode == "dirichlet_zero":
        return G.ALL_LABELS
    return G.OUTER_LABELS


def _make_symmetry_pairs(geo: G.Geometry, rng, n: int = 128):
    """Mirror pairs about the tip line (losses valid on both sides,
    StrainLimiting_KAN_PINN.py:831-852)."""
    y0 = geo.tip[1]
    pts = G.sample_interior_uniform(geo, rng, n,
                                    box=(geo.xmin, geo.xmax, y0, geo.ymax))
    ym = 2 * y0 - pts[:, 1]
    ok = (ym >= geo.ymin) & (ym <= geo.ymax) \
        & ~geo.in_void(pts[:, 0], ym)
    a = pts[ok]
    b = np.stack([pts[ok][:, 0], ym[ok]], axis=1).astype(np.float32)
    return a, b


@dataclasses.dataclass
class EpochBatch:
    interior: np.ndarray
    tip_pts: np.ndarray
    bdata: dict
    btargets: dict
    sym_a: np.ndarray
    sym_b: np.ndarray
    # uniform candidate pool for device-side top-|r| selection ([0,2]
    # when adaptive resampling is off)
    adaptive_cand: np.ndarray = dataclasses.field(
        default_factory=lambda: np.empty((0, 2), np.float32))


def adaptive_residual_points(cfg: PINNConfig, geo: G.Geometry,
                             mat: L.Material, model, params, rng,
                             n_pick: int) -> np.ndarray:
    """Host-side top-|residual| candidate selection (:400-431): evaluate
    the PDE residual on a uniform candidate pool and keep the worst
    points. The training loop itself uses the DEVICE-side equivalent
    (jax.lax.top_k inside the epoch-block scan, so every epoch's picks
    see the current params); this host version remains for ad-hoc
    analysis."""
    if n_pick <= 0:
        return np.empty((0, 2), np.float32)
    n_cand = max(cfg.adaptive_candidates, 4 * n_pick)
    cand = G.sample_interior_uniform(geo, rng, n_cand)

    def phi(p):
        return model.phi(params, p)

    r = np.abs(np.asarray(L.pde_residual(phi, jnp.asarray(cand), mat)))
    top = np.argpartition(r, -n_pick)[-n_pick:]
    return cand[top].astype(np.float32)


def sample_epoch_batch(cfg: PINNConfig, geo: G.Geometry, rng,
                       val: bool = False, n_sym: int = 128,
                       adaptive_pts: np.ndarray | None = None,
                       n_cand: int = 0) -> EpochBatch:
    counts = dict(
        uniform=cfg.val_n_interior_uniform if val else cfg.n_interior_uniform,
        refine=cfg.val_n_interior_refine if val else cfg.n_interior_refine,
        tip_strip=(cfg.val_n_interior_tip_strip if val
                   else cfg.n_interior_tip_strip),
        tip_annulus=(cfg.val_n_interior_tip_annulus if val
                     else cfg.n_interior_tip_annulus),
    )
    interior, region = G.sample_interior(geo, rng, counts)
    # tip-loss points = the tip_strip + tip_annulus strata
    n_tail = counts["tip_strip"] + counts["tip_annulus"]
    tip_pts = interior[-n_tail:] if n_tail else np.empty((0, 2), np.float32)
    if adaptive_pts is not None and adaptive_pts.shape[0]:
        interior = np.concatenate([interior, adaptive_pts], axis=0)
    n_each = cfg.val_n_boundary_each if val else cfg.n_boundary_each
    bdata = G.sample_boundaries(geo, rng, n_each)
    labels = _dirichlet_labels(cfg)
    bdata = {k: v for k, v in bdata.items() if k in labels}
    btargets = {k: G.dirichlet_target(k, v) for k, v in bdata.items()}
    # pad symmetry pairs to a fixed shape (mask via zero-weight dupes)
    a, b = _make_symmetry_pairs(geo, rng, n_sym)
    if a.shape[0] == 0:
        a = b = np.zeros((1, 2), np.float32)
    want = max(n_sym // 2, 1)
    idx = np.resize(np.arange(a.shape[0]), want)
    cand = (G.sample_interior_uniform(geo, rng, n_cand) if n_cand > 0
            else np.empty((0, 2), np.float32))
    return EpochBatch(interior, tip_pts, bdata, btargets, a[idx], b[idx],
                      adaptive_cand=cand)


def make_step(cfg: PINNConfig, model: KANPINN, geo: G.Geometry,
              mat: L.Material, opt):
    near, far = G.tip_ratio_line_points(geo, 64, 64)
    near, far = jnp.asarray(near), jnp.asarray(far)
    tip = geo.tip

    def total_loss(params, interior, tip_pts, bdata, btargets,
                   sym_a, sym_b, pde_w):
        def phi(p):
            return model.phi(params, p)

        lpde = L.weighted_pde_loss(
            phi, interior, mat, tip, weight_power=cfg.tip_weight_power,
            residual=cfg.residual, fd_eps=cfg.fd_eps)
        lbc, _ = L.boundary_loss(phi, bdata, btargets)
        lg = L.gauge_loss(phi)
        lsym = L.symmetry_loss(phi, sym_a, sym_b)
        loss = (cfg.lambda_pde * pde_w * lpde + cfg.lambda_bc * lbc
                + cfg.lambda_gauge * lg + cfg.lambda_sym * lsym)
        ratio = jnp.asarray(0.0)
        if cfg.lambda_tip > 0 and tip_pts.shape[0] > 0:
            loss = loss + cfg.lambda_tip * L.tip_stress_loss(
                phi, tip_pts, tip, c=cfg.tip_stress_c,
                r_weight_power=cfg.tip_loss_r_weight_power)
        if cfg.lambda_tip_ratio > 0:
            lratio, ratio = L.tip_ratio_loss(phi, near, far,
                                             target=cfg.tip_ratio_target)
            loss = loss + cfg.lambda_tip_ratio * lratio
        aux = {"pde": lpde, "bc": lbc, "gauge": lg, "sym": lsym,
               "ratio": ratio}
        return loss, aux

    @jax.jit
    def step(params, opt_state, interior, tip_pts, bdata, btargets,
             sym_a, sym_b, pde_w, lr):
        (loss, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(
            params, interior, tip_pts, bdata, btargets, sym_a, sym_b,
            pde_w)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    @jax.jit
    def block_step(params, opt_state, blocks, pde_ws, lrs):
        """Run a whole block of epochs in ONE device call: `blocks` is an
        epoch-batch pytree with a leading epoch axis; lax.scan consumes
        one epoch per iteration. This amortizes the host<->device
        round-trip (through this environment's TPU tunnel, per-epoch
        dispatch costs ~2 s; per-block it is negligible).

        Adaptive resampling runs per epoch ON DEVICE: each epoch carries
        a fresh uniform candidate pool; the scan body scores |PDE
        residual| with the CURRENT params and keeps the jax.lax.top_k
        worst — exact `StrainLimiting_KAN_PINN.py:400-431` semantics
        (the reference re-picks with the live model every epoch),
        without any host round-trip."""

        def body(carry, xs):
            params, opt_state = carry
            b, pde_w, lr = xs
            interior = b["interior"]
            if cfg.n_adaptive > 0:
                def phi_cur(p):
                    return model.phi(params, p)

                cand = b["adaptive_cand"]
                r = (L.pde_residual(phi_cur, cand, mat)
                     if cfg.residual == "autograd" else
                     L.pde_residual_fd(phi_cur, cand, mat, cfg.fd_eps))
                _, top = jax.lax.top_k(jnp.abs(r), cfg.n_adaptive)
                # before the PDE ramp the residual is untrained noise:
                # fall back to the first k (uniform) candidates
                idx = jnp.where(pde_w > 0, top,
                                jnp.arange(cfg.n_adaptive))
                interior = jnp.concatenate([interior, cand[idx]], axis=0)
            (loss, aux), grads = jax.value_and_grad(
                total_loss, has_aux=True)(
                params, interior, b["tip_pts"], b["bdata"],
                b["btargets"], b["sym_a"], b["sym_b"], pde_w)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, aux["pde"], aux["bc"],
                                         aux["ratio"])

        (params, opt_state), hist = jax.lax.scan(
            body, (params, opt_state), (blocks, pde_ws, lrs))
        return params, opt_state, hist

    @jax.jit
    def eval_losses(params, interior, tip_pts, bdata, btargets,
                    sym_a, sym_b):
        def phi(p):
            return model.phi(params, p)

        lpde = L.weighted_pde_loss(
            phi, interior, mat, tip, weight_power=cfg.tip_weight_power,
            residual=cfg.residual, fd_eps=cfg.fd_eps)
        lbc, terms = L.boundary_loss(phi, bdata, btargets)
        lg = L.gauge_loss(phi)
        lsym = L.symmetry_loss(phi, sym_a, sym_b)
        return lpde, lbc, lg, lsym

    return step, block_step, eval_losses, total_loss


def pde_weight_schedule(cfg: PINNConfig, epoch: int) -> float:
    """Curriculum (:1077-1085): 0 until pretrain, linear ramp to 1."""
    if epoch < cfg.pretrain_epochs:
        return 0.0
    r = (epoch - cfg.pretrain_epochs) / max(cfg.pde_ramp_epochs, 1)
    return float(min(1.0, r))


def train(cfg: PINNConfig | None = None, geo: G.Geometry | None = None,
          mat: L.Material | None = None, checkpoint_dir: str | None = None,
          resume: bool = False, verbose: bool = False) -> dict[str, Any]:
    cfg = cfg or PINNConfig()
    geo = geo or G.Geometry()
    mat = mat or L.Material()
    rng = np.random.default_rng(cfg.seed)
    model = KANPINN(cfg.widths, cfg.n_basis, cfg.trainable_centers)
    params = model.init(jax.random.PRNGKey(cfg.seed))
    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adam(learning_rate)))(learning_rate=cfg.learning_rate)
    opt_state = opt.init(params)

    step, block_step, eval_losses, _ = make_step(cfg, model, geo, mat, opt)
    val_batch = sample_epoch_batch(cfg, geo, rng, val=True)
    vb = _to_jax(val_batch)

    # optional dp sharding: batch axes sharded, params/opt replicated;
    # block_step's math is untouched — jit/GSPMD partitions the program
    # and inserts the cross-device reductions (sharding-independent
    # semantics, so gradients are the exact full-batch values)
    shard_blocks = None
    if cfg.dp > 1:
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as _P
        devs = jax.devices()
        if len(devs) < cfg.dp:
            raise ValueError(f"dp={cfg.dp} needs {cfg.dp} devices, "
                             f"have {len(devs)}")
        mesh = Mesh(np.asarray(devs[:cfg.dp]), ("dp",))
        data_s = NamedSharding(mesh, _P(None, "dp"))   # [epoch, batch,...]
        repl = NamedSharding(mesh, _P())

        def _shard_leaf(x):
            # batch axis is axis 1 (axis 0 = epoch); tiny/empty leaves
            # (e.g. a disabled tip-point or candidate set) and axes the
            # mesh doesn't divide evenly (e.g. the fixed-size boundary
            # block on an odd dp) replicate — GSPMD composes mixed
            # sharded/replicated operands without further ceremony
            ok = x.ndim >= 2 and x.shape[1] >= cfg.dp \
                and x.shape[1] % cfg.dp == 0
            return jax.device_put(x, data_s if ok else repl)

        shard_blocks = lambda blocks: jax.tree_util.tree_map(
            _shard_leaf, blocks)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        vb = jax.device_put(vb, repl)

    ckptr = None
    start_epoch = 0
    if checkpoint_dir:
        from kanodes_tpu.train.checkpoint import Checkpointer, TrainState
        ckptr = Checkpointer(checkpoint_dir)
        if resume and ckptr.latest_step() is not None:
            st = ckptr.restore()
            params = st["params"]
            start_epoch = int(st["step"])

    best = {"loss": float("inf"), "params": params, "epoch": -1}
    history = {"loss": [], "pde": [], "bc": [], "val": [], "ratio": []}
    stale = 0
    n_total = cfg.adam_epochs + cfg.finetune_epochs
    B = max(cfg.validation_every, 1)
    t0 = time.time()

    epoch = start_epoch
    while epoch < n_total:
        nb = min(B, n_total - epoch)
        epochs = list(range(epoch, epoch + nb))
        # adaptive top-k selection happens per-epoch inside block_step;
        # the host only supplies fresh uniform candidate pools
        n_cand = (max(cfg.adaptive_candidates, 4 * cfg.n_adaptive)
                  if cfg.n_adaptive > 0 else 0)
        batches = [sample_epoch_batch(cfg, geo, rng, n_cand=n_cand)
                   for _ in epochs]
        blocks = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[_to_jax(b) for b in batches])
        if shard_blocks is not None:
            blocks = shard_blocks(blocks)
        pde_ws = jnp.asarray([pde_weight_schedule(cfg, e) for e in epochs],
                             jnp.float32)
        lrs = jnp.asarray([cfg.learning_rate if e < cfg.adam_epochs
                           else cfg.finetune_lr for e in epochs],
                          jnp.float32)
        params, opt_state, hist = block_step(params, opt_state, blocks,
                                             pde_ws, lrs)
        losses, pdes, bcs, ratios = (np.asarray(h) for h in hist)
        history["loss"].extend(losses.tolist())
        history["pde"].extend(pdes.tolist())
        history["bc"].extend(bcs.tolist())
        history["ratio"].extend(ratios.tolist())
        epoch += nb
        pde_w = pde_weight_schedule(cfg, epoch - 1)

        v_lpde, v_lbc, v_lg, v_lsym = eval_losses(
            params, vb["interior"], vb["tip_pts"], vb["bdata"],
            vb["btargets"], vb["sym_a"], vb["sym_b"])
        # physics-aware selection: pde floored at 0.25 (:1754-1766)
        sel = (max(pde_w, 0.25) * float(v_lpde)
               + cfg.lambda_bc * float(v_lbc)
               + cfg.lambda_gauge * float(v_lg)
               + cfg.lambda_sym * float(v_lsym))
        history["val"].append((epoch - 1, sel))
        if sel < best["loss"] - cfg.min_improve:
            best = {"loss": sel, "params": params, "epoch": epoch - 1}
            stale = 0
        else:
            stale += 1
        if verbose:
            print(f"ep {epoch - 1} loss {losses[-1]:.4g} "
                  f"pde {pdes[-1]:.4g} bc {bcs[-1]:.4g} "
                  f"val {sel:.4g} ratio {ratios[-1]:.3f} "
                  f"pde_w {pde_w:.2f} "
                  f"({epoch / (time.time() - t0):.1f} ep/s)",
                  flush=True)
        if stale >= cfg.early_stop_patience:
            break
        if ckptr and cfg.checkpoint_every \
                and epoch % max(cfg.checkpoint_every, B) < B:
            from kanodes_tpu.train.checkpoint import TrainState
            # cfg rides along so the acceptance-gate CLI can rebuild the
            # model and recompute diagnostics from the checkpoint alone
            # (eval_pass_fail.py:13-20 loads the training module the
            # same way)
            ckptr.save(TrainState(params=params, step=epoch,
                                  best_params=best["params"],
                                  best_loss=best["loss"],
                                  extra={"pinn_cfg":
                                         dataclasses.asdict(cfg)}))

    return {"model": model, "params": params, "best_params": best["params"],
            "best_val": best["loss"], "best_epoch": best["epoch"],
            "history": history, "cfg": cfg, "geo": geo, "mat": mat,
            "seconds": time.time() - t0}


def _to_jax(batch: EpochBatch) -> dict:
    return {
        "interior": jnp.asarray(batch.interior),
        "tip_pts": jnp.asarray(batch.tip_pts),
        "bdata": {k: jnp.asarray(v) for k, v in batch.bdata.items()},
        "btargets": {k: jnp.asarray(v) for k, v in batch.btargets.items()},
        "sym_a": jnp.asarray(batch.sym_a),
        "sym_b": jnp.asarray(batch.sym_b),
        "adaptive_cand": jnp.asarray(batch.adaptive_cand),
    }


def validation_selection(cfg: PINNConfig, geo: G.Geometry, mat: L.Material,
                         model: KANPINN, params, pde_w: float = 1.0) -> float:
    """Recompute the physics-aware model-selection value
    (StrainLimiting_KAN_PINN.py:1754-1766) on the SAME fixed validation
    batch `train()` used: the val batch is the first draw from
    default_rng(cfg.seed), so it is reconstructible from the config
    alone. Lets post-hoc params (e.g. an L-BFGS polish) be scored on
    the exact metric that picked `best_params` during training."""
    rng = np.random.default_rng(cfg.seed)
    vb = _to_jax(sample_epoch_batch(cfg, geo, rng, val=True))
    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate))(learning_rate=0.0)
    _, _, eval_losses, _ = make_step(cfg, model, geo, mat, opt)
    v_lpde, v_lbc, v_lg, v_lsym = eval_losses(
        params, vb["interior"], vb["tip_pts"], vb["bdata"],
        vb["btargets"], vb["sym_a"], vb["sym_b"])
    return (max(pde_w, 0.25) * float(v_lpde) + cfg.lambda_bc * float(v_lbc)
            + cfg.lambda_gauge * float(v_lg) + cfg.lambda_sym * float(v_lsym))


def polish_pinn(out: dict, iters: int = 100, seed_offset: int = 777,
                linesearch_steps: int = 15, n_batches: int = 1) -> dict:
    """L-BFGS-polish trained PINN params on a FROZEN collocation set.

    Training selects `best_params` by a validation metric, but Adam at
    small lr still wanders near its floor (the same effect the
    surrogate best-capture pipeline measured — see train/polish.py).
    The PINN loss resamples collocation points every epoch, so a
    curvature-aware polish needs a fixed objective: this freezes
    `n_batches` val-sized stratified batches drawn from an rng stream
    the training never touched (cfg.seed + seed_offset) and minimizes
    their mean composite loss at final curriculum weight (pde_w = 1) —
    the same objective `make_step.total_loss` trains, including the
    tip-stress and tip-ratio hinge terms that drive the acceptance
    gates (eval_pass_fail.py:33-38). n_batches > 1 reduces the
    frozen-sample variance (the stochastic-objective analogue of the
    surrogates' deterministic polish).

    Returns {params, best_loss, loss_history} from train.polish.polish;
    params are best-so-far, never worse than the input on this frozen
    objective.
    """
    from kanodes_tpu.train.polish import PolishConfig, polish

    cfg, geo, mat = out["cfg"], out["geo"], out["mat"]
    model = out["model"]
    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate))(learning_rate=0.0)
    _, _, _, total_loss = make_step(cfg, model, geo, mat, opt)
    rng = np.random.default_rng(cfg.seed + seed_offset)
    batches = [_to_jax(sample_epoch_batch(cfg, geo, rng, val=True))
               for _ in range(n_batches)]
    pde_w = jnp.asarray(1.0, jnp.float32)

    def loss_fn(params):
        acc = 0.0
        for b in batches:
            loss, _ = total_loss(params, b["interior"], b["tip_pts"],
                                 b["bdata"], b["btargets"], b["sym_a"],
                                 b["sym_b"], pde_w)
            acc = acc + loss
        return acc / len(batches)

    return polish(loss_fn, out["best_params"],
                  PolishConfig(iters=iters,
                               linesearch_steps=linesearch_steps))


# ---------------------------------------------------------------------------
# cross-verification diagnostics (run_cross_verification,
# StrainLimiting_KAN_PINN.py:1249-1313; .jl:394-407)
# ---------------------------------------------------------------------------

def cross_verification(out: dict, n_grid: int = 101) -> dict:
    cfg, geo, mat = out["cfg"], out["geo"], out["mat"]
    model, params = out["model"], out["best_params"]
    rng = np.random.default_rng(cfg.seed + 1)

    def phi(p):
        return model.phi(params, p)

    batch = sample_epoch_batch(cfg, geo, rng, val=True)
    interior = jnp.asarray(batch.interior)
    res = np.asarray(L.pde_residual(phi, interior, mat)) \
        if cfg.residual == "autograd" else \
        np.asarray(L.pde_residual_fd(phi, interior, mat, cfg.fd_eps))

    a, b = _make_symmetry_pairs(geo, rng, 512)
    pa = np.asarray(jax.vmap(phi)(jnp.asarray(a)))
    pb = np.asarray(jax.vmap(phi)(jnp.asarray(b)))
    sym_err = np.abs(pa - pb)

    near, far = G.tip_ratio_line_points(geo, 64, 64)
    _, _, tn = L.stress(phi, jnp.asarray(near))
    _, _, tf = L.stress(phi, jnp.asarray(far))
    ratio = float(jnp.mean(tn) / (jnp.mean(tf) + 1e-8))

    # NaN sweep over the full grid outside the notch (:1181-1193)
    xs = np.linspace(geo.xmin, geo.xmax, n_grid)
    ys = np.linspace(geo.ymin, geo.ymax, n_grid)
    XX, YY = np.meshgrid(xs, ys)
    mask = ~geo.in_void(XX, YY)
    pts = np.stack([XX[mask], YY[mask]], axis=1).astype(np.float32)
    vals = np.asarray(jax.vmap(phi)(jnp.asarray(pts)))
    nonfinite = int(np.sum(~np.isfinite(vals)))

    # per-boundary Dirichlet errors
    berr = {}
    for label, xy in batch.bdata.items():
        pred = np.asarray(jax.vmap(phi)(jnp.asarray(xy)))
        tgt = batch.btargets[label]
        berr[label] = float(np.mean((pred - tgt) ** 2))

    return {
        "pde_residual_mean_abs": float(np.mean(np.abs(res))),
        "pde_residual_max_abs": float(np.max(np.abs(res))),
        "symmetry_mean_abs": float(np.mean(sym_err)),
        "tip_near_far_ratio": ratio,
        "nonfinite_grid_points": nonfinite,
        "boundary_mse": berr,
        "best_val": float(out["best_val"]),
    }


if __name__ == "__main__":
    # CLI parity with the reference's `python StrainLimiting_KAN_PINN.py`
    # entry (:2004-2126): full two-stage training, cross-verification,
    # gate report, diagnostics JSON. Config via KANODE_PINN_* env vars
    # and --key=value args (e.g. --adam_epochs=2000); --julia selects
    # the Julia-flavor preset, --checkpoint[=dir] + --resume enable
    # checkpointing, --out=path writes the diagnostics JSON.
    import json as _json
    import sys as _sys
    import time as _time

    from kanodes_tpu.diag.gates import evaluate as _gate_eval
    from kanodes_tpu.diag.gates import report as _gate_report
    from kanodes_tpu.train.config import override_from_args, \
        override_from_env

    _argv = _sys.argv[1:]
    cfg = PINNConfig.julia_small() if "--julia" in _argv else PINNConfig()
    cfg = override_from_env(cfg, "KANODE_PINN_")
    cfg = override_from_args(cfg, [a for a in _argv
                                   if a.split("=")[0][2:].replace("-", "_")
                                   in {f.name for f in
                                       dataclasses.fields(PINNConfig)}])
    ckpt_dir = None
    for a in _argv:
        if a == "--checkpoint":
            ckpt_dir = "checkpoints/pinn"
        elif a.startswith("--checkpoint="):
            ckpt_dir = a.split("=", 1)[1]
    out_path = next((a.split("=", 1)[1] for a in _argv
                     if a.startswith("--out=")), None)

    _t0 = _time.time()
    out = train(cfg, checkpoint_dir=ckpt_dir,
                resume="--resume" in _argv, verbose=True)
    _dt = _time.time() - _t0
    diag = cross_verification(out)
    res = _gate_eval(diag)
    print(_gate_report(res))
    epochs = cfg.adam_epochs + cfg.finetune_epochs
    print(f"best val {out['best_val']:.4g}  "
          f"({epochs} epochs in {_dt:.1f}s, {epochs / _dt:.1f} ep/s)")
    if out_path:
        with open(out_path, "w") as f:
            _json.dump({**diag, "wall_s": round(_dt, 1),
                        "all_gates_pass": bool(res["passed"])},
                       f, indent=1, default=float)
        print(f"wrote {out_path}")
