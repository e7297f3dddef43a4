"""Live-chip kernel regression test (VERDICT weak #8: CI runs the Pallas
kernels only in CPU interpret mode; the Mosaic-compiled code paths need a
numerical gate on real hardware). Skipped unless DINOX_TEST_TPU=1 —
tests/conftest.py forces the CPU backend otherwise. The same check runs as
``python bench.py --check`` in the verify recipe before every bench."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.tpu
@pytest.mark.skipif(
    not os.environ.get("DINOX_TEST_TPU"),
    reason="needs the real TPU chip (set DINOX_TEST_TPU=1)",
)
def test_pallas_kernels_match_xla_on_chip():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the TPU plugin win
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--check"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"kernel check failed:\n{proc.stderr[-3000:]}"
    assert '"pallas_kernel_check", "value": 1' in proc.stdout
