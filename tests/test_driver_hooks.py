"""Regression tests for the driver hooks (__graft_entry__.py).

The round-1 multi-chip dryrun failed because the mesh was built from bare
jax.devices(), which the axon TPU plugin hijacks; these tests pin the
CPU-mesh behavior so it can never regress.
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_on_cpu_mesh():
    import __graft_entry__ as hooks

    assert len(jax.devices("cpu")) >= 8, "conftest must force 8 CPU devices"
    hooks.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as hooks

    fn, args = hooks.entry()
    jax.jit(fn).lower(*args).compile()
