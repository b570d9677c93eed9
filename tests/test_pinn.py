"""Strain-limiting KAN-PINN: geometry, residual fidelity, losses,
short training, gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanodes_tpu.pinn import geometry as G
from kanodes_tpu.pinn import losses as L
from kanodes_tpu.pinn.model import GaussianKANLayer, KANPINN
from kanodes_tpu.pinn.train import (PINNConfig, sample_epoch_batch, train,
                                    cross_verification, pde_weight_schedule)


@pytest.fixture
def geo():
    return G.Geometry()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestGeometry:
    def test_void_test(self, geo):
        assert bool(geo.in_void(0.6, 0.5))            # on the notch axis
        assert not bool(geo.in_void(0.4, 0.5))        # left of tip
        assert not bool(geo.in_void(0.6, 0.8))        # above the wedge
        assert bool(geo.in_void(0.99999, 0.45))       # inside wedge near mouth
        assert not bool(geo.in_void(0.99999, 0.35))   # below the wedge
        # mouth points lie on the far boundary-ish
        pu, pl = geo.mouth_points()
        assert pu[0] == pytest.approx(0.5 + 0.5 * np.cos(np.radians(10)))

    def test_samplers_avoid_void(self, geo, rng):
        for fn in (G.sample_interior_uniform, G.sample_refine_box,
                   G.sample_tip_strip, G.sample_tip_annulus):
            pts = fn(geo, rng, 200)
            assert pts.shape == (200, 2)
            assert not geo.in_void(pts[:, 0], pts[:, 1]).any(), fn.__name__

    def test_tip_strip_left_of_tip(self, geo, rng):
        pts = G.sample_tip_strip(geo, rng, 300)
        assert (pts[:, 0] <= geo.tip[0] + 1e-6).all()
        # inside the mirrored wedge (acceptance region)
        half = np.tan(geo.notch_angle / 2) * (geo.tip[0] - pts[:, 0])
        assert (np.abs(pts[:, 1] - geo.tip[1]) <= half + 1e-6).all()

    def test_boundaries(self, geo, rng):
        b = G.sample_boundaries(geo, rng, 64)
        assert set(b) == set(G.ALL_LABELS)
        np.testing.assert_allclose(b["G1"][:, 0], geo.xmin)
        np.testing.assert_allclose(b["G2"][:, 0], geo.xmax)
        # G2 avoids the notch mouth span
        pu, pl = geo.mouth_points()
        ylo, yhi = sorted((pl[1], pu[1]))
        assert ((b["G2"][:, 1] < ylo) | (b["G2"][:, 1] > yhi)).all()
        # notch faces are in the void boundary (distance from tip <= L)
        d = np.linalg.norm(b["G5a"] - np.asarray(geo.tip), axis=1)
        assert (d <= geo.notch_length + 1e-6).all()

    def test_dirichlet_targets(self, geo, rng):
        b = G.sample_boundaries(geo, rng, 8)
        assert (G.dirichlet_target("G1", b["G1"]) == 1.0).all()
        assert (G.dirichlet_target("G2", b["G2"]) == 0.0).all()
        np.testing.assert_allclose(G.dirichlet_target("G3", b["G3"]),
                                   -(b["G3"][:, 0] - 1.0), rtol=1e-6)


class TestModel:
    def test_layer_shapes_and_grads(self):
        l = GaussianKANLayer(2, 8, 6)
        p = l.init(jax.random.PRNGKey(0))
        y = l.apply(p, jnp.ones((5, 2)) * 0.3)
        assert y.shape == (5, 8)
        g = jax.grad(lambda p: jnp.sum(l.apply(p, jnp.ones((3, 2))) ** 2))(p)
        assert float(jnp.abs(g["centers"]).max()) > 0   # trainable centers

    def test_fixed_centers_variant(self):
        l = GaussianKANLayer(2, 4, 6, trainable_centers=False)
        p = l.init(jax.random.PRNGKey(0))
        g = jax.grad(lambda p: jnp.sum(l.apply(p, jnp.ones((3, 2))) ** 2))(p)
        assert float(jnp.abs(g["centers"]).max()) == 0.0
        assert float(jnp.abs(g["logwidth"]).max()) == 0.0

    def test_pinn_forward(self):
        net = KANPINN((2, 16, 16, 1), n_basis=8)
        p = net.init(jax.random.PRNGKey(1))
        phi = net.phi(p, jnp.asarray([[0.5, 0.5], [0.1, 0.9]]))
        assert phi.shape == (2,)


class TestResidual:
    def test_residual_on_harmonic_field_linear_flux(self):
        """For alpha-degenerate material (beta=0) the flux is grad/2mu,
        so div q = lap(phi)/(2mu); a harmonic phi gives ~0 residual."""
        mat = L.Material(mu=1.0, beta=0.0, alpha=1.0)

        def phi(p):
            return p[0] ** 2 - p[1] ** 2     # harmonic

        xy = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (50, 2)),
                         jnp.float32)
        r = L.pde_residual(phi, xy, mat)
        np.testing.assert_allclose(r, 0.0, atol=1e-4)
        # non-harmonic field: residual = lap/(2mu) = 4/2 = 2
        r2 = L.pde_residual(lambda p: p[0] ** 2 + p[1] ** 2, xy, mat)
        np.testing.assert_allclose(r2, 2.0, rtol=1e-3, atol=1e-3)

    def test_fd_residual_matches_autograd(self):
        mat = L.Material()
        net = KANPINN((2, 8, 1), n_basis=6)
        params = net.init(jax.random.PRNGKey(2))

        def phi(p):
            return net.phi(params, p)

        xy = jnp.asarray(np.random.default_rng(1).uniform(0.1, 0.4, (20, 2)),
                         jnp.float32)
        r_ad = L.pde_residual(phi, xy, mat)
        r_fd = L.pde_residual_fd(phi, xy, mat, fd_eps=1e-3)
        np.testing.assert_allclose(r_ad, r_fd, rtol=0.05, atol=1e-3)

    def test_stress_definition(self):
        def phi(p):
            return 3.0 * p[0] + 2.0 * p[1]

        xy = jnp.zeros((4, 2))
        txz, tyz, teq = L.stress(phi, xy)
        np.testing.assert_allclose(txz, 2.0, rtol=1e-6)
        np.testing.assert_allclose(tyz, -3.0, rtol=1e-6)
        np.testing.assert_allclose(teq, np.sqrt(13.0), rtol=1e-5)


class TestTraining:
    def test_pde_weight_schedule(self):
        cfg = PINNConfig(pretrain_epochs=100, pde_ramp_epochs=200)
        assert pde_weight_schedule(cfg, 0) == 0.0
        assert pde_weight_schedule(cfg, 99) == 0.0
        assert pde_weight_schedule(cfg, 200) == pytest.approx(0.5)
        assert pde_weight_schedule(cfg, 1000) == 1.0

    @pytest.fixture
    def tiny_cfg(self):
        return PINNConfig(
            widths=(2, 12, 1), n_basis=6, adam_epochs=30,
            finetune_epochs=10, pretrain_epochs=5, pde_ramp_epochs=10,
            n_interior_uniform=64, n_interior_refine=32,
            n_interior_tip_strip=64, n_interior_tip_annulus=32,
            n_boundary_each=24, val_n_interior_uniform=64,
            val_n_interior_refine=32, val_n_interior_tip_strip=64,
            val_n_interior_tip_annulus=32, val_n_boundary_each=24,
            validation_every=10)

    def test_short_training_descends_and_verifies(self, tiny_cfg):
        out = train(tiny_cfg)
        h = out["history"]
        assert np.isfinite(h["loss"]).all()
        assert h["loss"][-1] < h["loss"][0]
        diag = cross_verification(out, n_grid=21)
        assert np.isfinite(diag["pde_residual_mean_abs"])
        assert diag["nonfinite_grid_points"] == 0

    def test_julia_flavor_trains(self):
        cfg = PINNConfig.julia_small()
        cfg = PINNConfig(**{**cfg.__dict__, "adam_epochs": 20,
                            "finetune_epochs": 5,
                            "n_interior_uniform": 64,
                            "n_interior_refine": 32,
                            "n_interior_tip_strip": 32,
                            "val_n_interior_tip_strip": 32,
                            "n_boundary_each": 16,
                            "validation_every": 10})
        out = train(cfg)
        assert np.isfinite(out["history"]["loss"]).all()

    def test_polish_never_worse_on_frozen_objective(self, tiny_cfg):
        from kanodes_tpu.pinn.train import polish_pinn, validation_selection
        out = train(tiny_cfg)
        pol = polish_pinn(out, iters=8, linesearch_steps=8)
        # polish guarantees best-so-far on ITS frozen objective: the
        # returned best_loss must not exceed the history's first value
        # (the starting point's loss)
        hist = np.asarray(pol["loss_history"])
        assert np.isfinite(hist).all()
        assert float(pol["best_loss"]) <= float(hist[0]) + 1e-6
        # the reconstructed selection metric matches train()'s best
        # within float noise when evaluated on best_params
        w = pde_weight_schedule(out["cfg"], out["best_epoch"])
        sel = validation_selection(out["cfg"], out["geo"], out["mat"],
                                   out["model"], out["best_params"],
                                   pde_w=w)
        assert np.isfinite(sel)
        assert sel == pytest.approx(out["best_val"], rel=1e-4)

    def test_gates(self, tiny_cfg):
        from kanodes_tpu.diag.gates import evaluate, report, GateThresholds
        out = train(tiny_cfg)
        diag = cross_verification(out, n_grid=21)
        res = evaluate(diag)
        txt = report(res)
        assert "tip_ratio" in txt
        # finite-grid gate must pass even for a barely-trained model
        assert res["checks"]["finite_grid"]["ok"]


@pytest.mark.slow
def test_adaptive_residual_resampling():
    from kanodes_tpu.pinn.train import adaptive_residual_points
    from kanodes_tpu.pinn import losses as L
    from kanodes_tpu.pinn.model import KANPINN
    import numpy as np
    geo = G.Geometry()
    mat = L.Material()
    cfg = PINNConfig(adaptive_candidates=256)
    model = KANPINN((2, 8, 1), n_basis=6)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    pts = adaptive_residual_points(cfg, geo, mat, model, params, rng, 32)
    assert pts.shape == (32, 2)
    assert not geo.in_void(pts[:, 0], pts[:, 1]).any()
    # training with n_adaptive keeps static shapes and runs
    tiny = PINNConfig(widths=(2, 10, 1), n_basis=6, adam_epochs=12,
                      finetune_epochs=0, pretrain_epochs=4,
                      pde_ramp_epochs=4, n_interior_uniform=32,
                      n_interior_refine=16, n_interior_tip_strip=32,
                      n_interior_tip_annulus=16, n_boundary_each=16,
                      val_n_interior_uniform=32, val_n_interior_refine=16,
                      val_n_interior_tip_strip=32,
                      val_n_interior_tip_annulus=16,
                      val_n_boundary_each=16, n_adaptive=16,
                      adaptive_candidates=128, validation_every=6)
    out = train(tiny)
    import numpy as np
    assert np.isfinite(out["history"]["loss"]).all()


def test_device_topk_matches_host_selection():
    """The in-scan jax.lax.top_k pick equals the host argpartition pick
    on the same candidate pool (StrainLimiting_KAN_PINN.py:400-431)."""
    import numpy as np
    from kanodes_tpu.pinn import losses as L
    from kanodes_tpu.pinn.model import KANPINN

    geo = G.Geometry()
    mat = L.Material()
    model = KANPINN((2, 8, 1), n_basis=6)
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(1)
    cand = G.sample_interior_uniform(geo, rng, 256)

    def phi(p):
        return model.phi(params, p)

    r = np.abs(np.asarray(L.pde_residual(phi, jnp.asarray(cand), mat)))
    host_pick = set(map(tuple, cand[np.argpartition(r, -16)[-16:]]))

    _, idx = jax.lax.top_k(jnp.abs(
        L.pde_residual(phi, jnp.asarray(cand), mat)), 16)
    dev_pick = set(map(tuple, cand[np.asarray(idx)]))
    assert dev_pick == host_pick


@pytest.mark.slow
def test_checkpoint_driven_gate_cli(tmp_path):
    """`diag.gates --checkpoint`: a checkpoint written by pinn.train can
    be audited standalone — model rebuilt from the stored config, the
    diagnostics recomputed from the restored best params, gates applied
    (eval_pass_fail.py:13-20,73-90 parity)."""
    from kanodes_tpu.diag import gates

    tiny = PINNConfig(widths=(2, 10, 1), n_basis=6, adam_epochs=8,
                      finetune_epochs=0, pretrain_epochs=2,
                      pde_ramp_epochs=4, n_interior_uniform=32,
                      n_interior_refine=16, n_interior_tip_strip=32,
                      n_interior_tip_annulus=16, n_boundary_each=16,
                      val_n_interior_uniform=32, val_n_interior_refine=16,
                      val_n_interior_tip_strip=32,
                      val_n_interior_tip_annulus=16,
                      val_n_boundary_each=16, validation_every=4,
                      checkpoint_every=4)
    ckdir = str(tmp_path / "ck")
    train(tiny, checkpoint_dir=ckdir)

    res, diag = gates.evaluate_checkpoint(ckdir)
    # structure: all five reference gates present, diagnostics recomputed
    assert set(res["checks"]) == {"tip_ratio", "best_val", "symmetry",
                                  "pde_residual", "finite_grid"}
    for key in ("pde_residual_mean_abs", "symmetry_mean_abs",
                "tip_near_far_ratio", "nonfinite_grid_points",
                "best_val"):
        assert key in diag
    import numpy as np
    assert np.isfinite(diag["pde_residual_mean_abs"])
    # the CLI returns 0/1 per the gate outcome and prints the report
    rc = gates.main(["--checkpoint", ckdir])
    assert rc == (0 if res["passed"] else 1)


@pytest.mark.slow
def test_dp_sharded_training_matches_single_device():
    """PINNConfig(dp=8): collocation/boundary batch axes sharded over the
    8-device mesh, params replicated. jit/GSPMD semantics are
    sharding-independent, so per-epoch losses and final params must match
    the unsharded run (identical seeded batches) to f32
    reduction-reorder tolerance."""
    import numpy as np
    base = dict(widths=(2, 10, 1), n_basis=6, adam_epochs=6,
                finetune_epochs=0, pretrain_epochs=2, pde_ramp_epochs=2,
                n_interior_uniform=32, n_interior_refine=16,
                n_interior_tip_strip=32, n_interior_tip_annulus=16,
                n_boundary_each=16, val_n_interior_uniform=32,
                val_n_interior_refine=16, val_n_interior_tip_strip=32,
                val_n_interior_tip_annulus=16, val_n_boundary_each=16,
                validation_every=3)
    out0 = train(PINNConfig(**base))
    out8 = train(PINNConfig(**base, dp=8))
    l0 = np.asarray(out0["history"]["loss"])
    l8 = np.asarray(out8["history"]["loss"])
    np.testing.assert_allclose(l8, l0, rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out0["params"]),
                    jax.tree_util.tree_leaves(out8["params"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-6)


@pytest.mark.slow
def test_dp_sharded_adaptive_topk_trains():
    """dp sharding composes with the in-scan adaptive top-k resampling
    (global top-k over a SHARDED candidate pool — GSPMD inserts the
    gather). Strict loss parity is not asserted here: f32 residuals can
    differ in the last ulp between partitionings, which may flip
    near-tied top-k picks; the run must stay finite and descend."""
    import numpy as np
    tiny = PINNConfig(widths=(2, 10, 1), n_basis=6, adam_epochs=8,
                      finetune_epochs=0, pretrain_epochs=2,
                      pde_ramp_epochs=2, n_interior_uniform=32,
                      n_interior_refine=16, n_interior_tip_strip=32,
                      n_interior_tip_annulus=16, n_boundary_each=16,
                      val_n_interior_uniform=32, val_n_interior_refine=16,
                      val_n_interior_tip_strip=32,
                      val_n_interior_tip_annulus=16,
                      val_n_boundary_each=16, n_adaptive=8,
                      adaptive_candidates=64, validation_every=4, dp=8)
    out = train(tiny)
    h = np.asarray(out["history"]["loss"])
    assert np.isfinite(h).all()
    assert h[-1] < h[0]
