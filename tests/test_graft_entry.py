"""Driver entry points stay healthy (compile-check + multichip dryrun)."""

import importlib.util
import os

import jax


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_compiles_and_runs():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (36, 2)


def test_dryrun_multichip_small():
    m = _load()
    m.dryrun_multichip(min(4, len(jax.devices())))
