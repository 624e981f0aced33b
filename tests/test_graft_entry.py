"""The driver's multichip gate, exercised in CI.

Round 1 failed the driver's 8-device dryrun because model init ran on the
default (TPU) backend; this pins the regression: the full dryrun must pass on
the virtual 8-CPU mesh (conftest sets xla_force_host_platform_device_count=8).
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    if len(jax.devices("cpu")) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    ge.dryrun_multichip(8)


def test_entry_smoke():
    import __graft_entry__ as ge

    fn, args = ge._flagship, None  # noqa: F841 — flagship ctor importable
    # entry() builds the full 2B-geometry flagship — too heavy for CI; just
    # check the small-config path compiles a forward step on CPU.
    model, cfg = ge._flagship(small=True)
    cache = model.init_cache(1, 64, jax.numpy.float32)
    import numpy as np

    ids = jax.numpy.asarray(np.ones((1, 8), np.int32))
    logits, cache = jax.jit(lambda m, c, i: m(i, c, last_only=True))(model, cache, ids)
    assert logits.shape == (1, 1, cfg.vocab_size)
