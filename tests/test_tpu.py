"""TPU device-path tier: exercises the COMPILED Pallas kernel and f32
numerics on real hardware when a chip is attached; auto-skips elsewhere.

Runs tests/tpu_check.py as a subprocess so the main suite's CPU pinning
and x64 config (tests/conftest.py) don't leak into the device run.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
@pytest.mark.slow
def test_device_path_on_tpu():
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tests", "tpu_check.py")],
        capture_output=True, text=True, timeout=1500, cwd=_REPO)
    if r.returncode == 42:
        pytest.skip("no TPU device attached")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "TPU_CHECK OK" in r.stdout, r.stdout + r.stderr
