"""Driver entry points stay healthy (compile-check + multichip dryrun).

The multichip tests deliberately simulate the DRIVER environment, not
the conftest one: a fresh subprocess whose CPU backend exposes fewer
devices than requested, so `dryrun_multichip` must self-provision the
virtual 8-device mesh (round-1 failure mode, MULTICHIP_r01.json).
"""

import importlib.util
import os
import re
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    path = os.path.join(REPO, "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _env_without_force_flag():
    env = dict(os.environ)
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", "")).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    env.pop("_KANODES_DRYRUN_CHILD", None)
    return env


def test_entry_compiles_and_runs():
    """entry() routes through the fused Pallas multistep kernel
    (interpret mode on CPU) and returns the [T, K, I] trajectory."""
    import numpy as np

    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (36, 1, 2)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_dryrun_multichip_in_process():
    # conftest already provisioned 8 CPU devices; run on 4 of them
    m = _load()
    m.dryrun_multichip(min(4, len(jax.devices())))


@pytest.mark.slow
def test_dryrun_multichip_driver_sim():
    """Fresh process, NO device-count flag, straight to dryrun(8) —
    the exact driver invocation that failed in round 1."""
    code = (f"import sys; sys.path.insert(0, {REPO!r}); "
            "import __graft_entry__ as g; g.dryrun_multichip(8)")
    res = subprocess.run([sys.executable, "-c", code],
                         env=_env_without_force_flag(), cwd=REPO,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip ok" in res.stdout
    # all five sharded driver modes ran (incl. the PINN dp batch mode
    # and the member-sharded LV seed ensemble)
    assert "PINN trained on dp=8" in res.stdout
    assert "LV seed ensemble (16 members) trained on dp=8" in res.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_backend_init():
    """Process whose CPU backend is already initialized with 1 device:
    dryrun_multichip must fall back to a clean subprocess re-exec."""
    code = (f"import sys; sys.path.insert(0, {REPO!r}); "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "n = len(jax.devices()); assert n == 1, n; "
            "import __graft_entry__ as g; g.dryrun_multichip(8)")
    res = subprocess.run([sys.executable, "-c", code],
                         env=_env_without_force_flag(), cwd=REPO,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
