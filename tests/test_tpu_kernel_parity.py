"""TPU-gated Pallas kernel parity (advisor finding r2-#2).

The suite pins the cpu backend (conftest), where the rasterizer runs
`composite_tiles_reference` — so the Pallas forward/backward kernels are never
exercised by the normal CPU run. On a TPU box, set TPU_SPLAT_TPU_TESTS=1 to run
`scripts/check_kernel_parity.py` (forward + gradient parity vs the XLA
reference, incl. an early-terminating saturated tile, plus the `_pack_gather`
custom-VJP check) in a fresh process where the platform pin doesn't apply."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("TPU_SPLAT_TPU_TESTS") != "1",
    reason="TPU-gated: set TPU_SPLAT_TPU_TESTS=1 on a box with a real TPU",
)
def test_pallas_kernel_parity_on_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the box's default (TPU) platform win
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_kernel_parity.py")],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env,
    )
    assert r.returncode == 0, f"parity harness failed:\n{r.stdout}\n{r.stderr}"
    assert "kernel parity OK" in r.stdout, r.stdout
