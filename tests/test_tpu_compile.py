"""Real-compile (non-interpret) smoke tests for every Pallas kernel.

The round-1 failure mode was a kernel that passed every interpret-mode
test and then failed Mosaic legalization on real hardware. These tests
run each kernel through the ACTUAL compile pipeline. This JAX build only supports interpret-mode Pallas on the CPU backend,
so under the normal test mesh (conftest forces 8 virtual CPU devices)
the whole module skips — the full check runs on TPU via bench.py's
prelude (testing/tpu_smoke.run_smoke) and on any developer box with a
TPU attached via JAX_PLATFORMS=tpu pytest.
"""
from __future__ import annotations

import jax
import pytest

from montecarlo_pathtracing_tpu.testing import tpu_smoke

ON_TPU = jax.devices()[0].platform == "tpu"

pytestmark = pytest.mark.skipif(
    not ON_TPU, reason="non-interpret Pallas needs a TPU backend")


@pytest.mark.parametrize("name,fn", tpu_smoke.SMOKES,
                         ids=[n for n, _ in tpu_smoke.SMOKES])
def test_kernel_real_compile(name, fn):
    fn()
