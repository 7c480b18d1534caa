"""Driver-contract tests: entry() compiles and runs; dryrun_multichip
executes one fully-sharded train step on the 8-device virtual mesh."""

import importlib.util

import jax
import numpy as np


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    mod = _load()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    mod = _load()
    mod.dryrun_multichip(8)
