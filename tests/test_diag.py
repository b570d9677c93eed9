"""Diagnostics: metrics, stability heuristics, gates, plots, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanodes_tpu.diag.metrics import (trajectory_metrics, horizon_error,
                                      stability_check, finite_grid_check,
                                      MetricsLogger)
from kanodes_tpu.diag.gates import GateThresholds, evaluate, report


def test_trajectory_metrics():
    pred = np.asarray([[1.0, 2.0], [3.0, 4.0]])
    truth = np.asarray([[1.0, 2.0], [3.0, 5.0]])
    m = trajectory_metrics(pred, truth)
    assert m["mse"] == pytest.approx(0.25)
    assert m["max_error"] == pytest.approx(1.0)
    assert m["rmse"] == pytest.approx(0.5)


def test_stability_check():
    good = np.sin(np.linspace(0, 10, 100))[:, None] + 1.0
    rep = stability_check(good)
    assert rep.stable and not rep.exploded
    bad = np.exp(np.linspace(0, 10, 100))[:, None]
    assert stability_check(bad).exploded
    nanny = good.copy()
    nanny[5, 0] = np.nan
    assert stability_check(nanny).nan_count == 1


def test_finite_grid_check():
    assert finite_grid_check(lambda x: x * 2, np.ones((5, 2))) == 0
    with np.errstate(divide="ignore"):   # deliberate non-finite field
        assert finite_grid_check(lambda x: x / 0.0, np.ones((3,))) == 3


def test_metrics_logger(tmp_path):
    ml = MetricsLogger()
    ml.log(0, loss=1.0, lr=0.1)
    ml.log(10, loss=0.5)
    p = tmp_path / "m.csv"
    ml.to_csv(str(p))
    content = p.read_text()
    assert "loss" in content and "0.5" in content
    ml.to_json(str(tmp_path / "m.json"))


def test_gates_report_fail_case():
    diag = {"tip_near_far_ratio": 1.0, "best_val": 100.0,
            "symmetry_mean_abs": 0.5, "pde_residual_mean_abs": 1e3,
            "nonfinite_grid_points": 2}
    res = evaluate(diag)
    assert not res["passed"]
    assert all(not c["ok"] for c in res["checks"].values())
    assert "FAIL" in report(res)


def test_gates_pass_case():
    diag = {"tip_near_far_ratio": 1.5, "best_val": 1.0,
            "symmetry_mean_abs": 0.01, "pde_residual_mean_abs": 1.0,
            "nonfinite_grid_points": 0}
    assert evaluate(diag)["passed"]


class TestPlots:
    def test_loss_curves_and_trend(self, tmp_path):
        from kanodes_tpu.diag.plots import loss_curves, trend_plot
        loss_curves({"kan": np.geomspace(1, 1e-5, 100)},
                    str(tmp_path / "l.png"))
        assert (tmp_path / "l.png").exists()
        trend_plot([{"model": "kan", "n_params": 240,
                     "train_loss": 2e-7}], str(tmp_path / "t.png"),
                   reference={"kan": {240: 8.3e-7}})
        assert (tmp_path / "t.png").exists()

    def test_lv_reconstruction_and_activations(self, tmp_path):
        from kanodes_tpu.diag.plots import lv_reconstruction, activation_grid
        from kanodes_tpu.models import KANChain
        ts = np.linspace(0, 14, 50)
        truth = np.stack([np.sin(ts) + 2, np.cos(ts) + 2], 1)
        lv_reconstruction(ts, truth, truth * 1.01, 3.5,
                          str(tmp_path / "r.png"))
        chain = KANChain.mlp_like([2, 5, 2], grid_len=5)
        p = chain.init(jax.random.PRNGKey(0))
        activation_grid(chain, p, jnp.asarray(truth, jnp.float32),
                        str(tmp_path / "a.png"))
        assert (tmp_path / "a.png").exists()

    def test_pde_contour(self, tmp_path):
        from kanodes_tpu.diag.plots import pde_contour
        pde_contour(np.linspace(0, 1, 11), np.linspace(-1, 1, 41),
                    np.random.default_rng(0).normal(size=(11, 41)),
                    str(tmp_path / "c.png"))
        assert (tmp_path / "c.png").exists()


def test_checkpointer_roundtrip(tmp_path):
    from kanodes_tpu.train.checkpoint import Checkpointer, TrainState
    ck = Checkpointer(str(tmp_path / "ckpt"), keep=2)
    params = {"w": jnp.arange(4.0)}
    for step in (10, 20, 30):
        ck.save(TrainState(params=params, step=step,
                           best_loss=1.0 / step))
    assert ck.steps() == [20, 30]          # keep=2 retention
    st = ck.restore()
    np.testing.assert_allclose(st["params"]["w"], np.arange(4.0))
    assert st["step"] == 30
    assert ck.restore(20)["step"] == 20


def test_gates_cli(tmp_path):
    import json
    import subprocess
    import sys
    diag = {"tip_near_far_ratio": 1.5, "best_val": 1.0,
            "symmetry_mean_abs": 0.01, "pde_residual_mean_abs": 1.0,
            "nonfinite_grid_points": 0}
    p = tmp_path / "diag.json"
    p.write_text(json.dumps(diag))
    from kanodes_tpu.diag.gates import main
    assert main([str(p)]) == 0
    diag["best_val"] = 1e9
    p.write_text(json.dumps(diag))
    assert main([str(p)]) == 1


def test_symbolic_error_contours(tmp_path):
    import jax.numpy as jnp
    from kanodes_tpu.diag.plots import symbolic_error_contours

    def kan_rhs(pts):
        return jnp.stack([1.49 * pts[:, 0] - pts[:, 0] * pts[:, 1],
                          pts[:, 0] * pts[:, 1] - 2.95 * pts[:, 1]], axis=1)

    def truth(pts):
        return np.stack([1.5 * pts[:, 0] - pts[:, 0] * pts[:, 1],
                         pts[:, 0] * pts[:, 1] - 3.0 * pts[:, 1]], axis=1)

    exprs = ["1.5017*x0 - x0*x1", "x0*x1 - 3.0072*x1"]
    symbolic_error_contours(kan_rhs, exprs, truth, ((0.1, 4), (0.1, 4)),
                            str(tmp_path / "e.png"), n=30)
    assert (tmp_path / "e.png").exists()
