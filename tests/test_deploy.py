"""Serving export: StableHLO artifact roundtrips match live inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanodes_tpu.deploy import (ServingArtifact, export_graybox_trajectory,
                                export_rhs, export_trajectory)
from kanodes_tpu.models import KDense
from kanodes_tpu.models.core import Chain
from kanodes_tpu.ode import odeint_fixed
from kanodes_tpu.pde import datagen
from kanodes_tpu.utils.precision import matmul_precision


@pytest.fixture
def lv_chain():
    model = Chain(KDense(2, 6, 5), KDense(6, 2, 5))
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_rhs_roundtrip_symbolic_batch(lv_chain, tmp_path):
    model, params = lv_chain
    art = export_rhs(model, params)          # symbolic batch
    p = str(tmp_path / "rhs.kexp")
    art.save(p)
    loaded = ServingArtifact.load(p)
    assert loaded.meta["kind"] == "rhs"
    assert loaded.meta["batch"] == "symbolic"
    # one artifact serves multiple batch sizes
    for b in (1, 3, 7):
        x = jnp.asarray(np.random.default_rng(b).normal(0, 0.5, (b, 2)),
                        jnp.float32)
        np.testing.assert_allclose(np.asarray(loaded(x)),
                                   np.asarray(model.apply(params, x)),
                                   rtol=1e-6, atol=1e-7)


def test_rhs_static_batch(lv_chain, tmp_path):
    model, params = lv_chain
    art = export_rhs(model, params, batch=4)
    assert art.meta["batch"] == 4
    x = jnp.ones((4, 2), jnp.float32)
    np.testing.assert_allclose(np.asarray(art(x)),
                               np.asarray(model.apply(params, x)),
                               rtol=1e-6, atol=1e-7)


def test_trajectory_roundtrip(lv_chain, tmp_path):
    model, params = lv_chain
    ts = jnp.linspace(0.0, 1.0, 11)
    art = export_trajectory(model, params, ts, solver="tsit5", substeps=2)
    p = str(tmp_path / "traj.kexp")
    art.save(p)
    loaded = ServingArtifact.load(p)
    assert loaded.meta["n_save"] == 11
    assert loaded.meta["solver"] == "tsit5"

    def rhs(t, u, _):
        return model.apply(params, u[None, :])[0]

    u0 = jnp.asarray([1.0, 1.0], jnp.float32)
    want = odeint_fixed(rhs, u0, ts, None, solver="tsit5", substeps=2)
    np.testing.assert_allclose(np.asarray(loaded(u0)), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


def test_graybox_trajectory_roundtrip(tmp_path):
    layer = KDense(1, 1, 8, normalizer="softsign")
    params = layer.init(jax.random.PRNGKey(1))
    n, dx, D = 24, 0.05, 0.01
    lap = jnp.asarray(datagen._cyclic_lap(n, dx), jnp.float32)
    ts = jnp.linspace(0.0, 0.2, 5)
    art = export_graybox_trajectory(layer, params, lap, D, ts, substeps=2)
    p = str(tmp_path / "gb.kexp")
    art.save(p)
    loaded = ServingArtifact.load(p)
    assert loaded.meta["grid_points"] == n

    def rhs(t, u, _):
        known = D * jnp.matmul(lap, u, precision=matmul_precision())
        return known + layer.apply(params, u[:, None])[:, 0]

    u0 = jnp.asarray(0.4 + 0.3 * np.sin(np.arange(n)), jnp.float32)
    want = odeint_fixed(rhs, u0, ts, None, solver="tsit5", substeps=2)
    np.testing.assert_allclose(np.asarray(loaded(u0)), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


def test_trajectory_batched_symbolic(lv_chain, tmp_path):
    """batch="any" exports a fleet-of-ICs rollout with a symbolic batch
    dimension: one artifact integrates any number of trajectories."""
    model, params = lv_chain
    ts = jnp.linspace(0.0, 0.5, 6)
    art = export_trajectory(model, params, ts, substeps=1, batch="any")
    assert art.meta["batch"] == "symbolic"
    p = str(tmp_path / "fleet.kexp")
    art.save(p)
    loaded = ServingArtifact.load(p)

    def rhs(t, u, _):
        return model.apply(params, u[None, :])[0]

    for b in (2, 5):
        u0s = jnp.asarray(np.random.default_rng(b).uniform(0.5, 1.5, (b, 2)),
                          jnp.float32)
        got = loaded(u0s)
        assert got.shape == (6, b, 2)
        for k in range(b):
            want = odeint_fixed(rhs, u0s[k], ts, None, solver="tsit5")
            np.testing.assert_allclose(np.asarray(got[:, k]),
                                       np.asarray(want),
                                       rtol=1e-5, atol=1e-6)


def test_pinn_field_export(tmp_path):
    """The generic field exporter serves the KAN-PINN displacement
    potential (same Layer protocol as the ODE models)."""
    from kanodes_tpu.pinn.model import KANPINN

    model = KANPINN(widths=(2, 8, 1), n_basis=6)
    params = model.init(jax.random.PRNGKey(3))
    from kanodes_tpu.deploy import export_field
    art = export_field(model, params)
    assert art.meta["kind"] == "field"
    p = str(tmp_path / "pinn.kexp")
    art.save(p)
    loaded = ServingArtifact.load(p)
    xy = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (13, 2)),
                     jnp.float32)
    np.testing.assert_allclose(np.asarray(loaded(xy)),
                               np.asarray(model.apply(params, xy)),
                               rtol=1e-6, atol=1e-7)


def test_multiplatform_payload(lv_chain):
    """Default export lowers for BOTH cpu and tpu into one artifact, so
    a dev-box export runs on the serving fleet unchanged."""
    model, params = lv_chain
    art = export_rhs(model, params, batch=2)
    assert set(art.platforms) == {"cpu", "tpu"}


def test_load_rejects_non_artifact(tmp_path):
    p = str(tmp_path / "junk.kexp")
    with open(p, "wb") as f:
        f.write(b"definitely not an artifact")
    with pytest.raises(ValueError, match="not a kanodes serving artifact"):
        ServingArtifact.load(p)
