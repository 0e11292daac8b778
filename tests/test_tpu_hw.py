"""Real-TPU hardware tests (Mosaic compile + Pallas/gather numeric parity).

Gated behind LINEMOD_TPU_HW_TESTS=1: the suite pins the CPU backend
(conftest.py) because remote-TPU compiles take ~20-40 s per executable, so
the hardware check runs in a subprocess with a clean environment. bench.py
exercises the same path every round.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("LINEMOD_TPU_HW_TESTS") != "1",
    reason="set LINEMOD_TPU_HW_TESTS=1 to run real-TPU hardware tests",
)
def test_pallas_gather_parity_on_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the TPU plugin register
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_parity.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "PARITY OK" in out.stdout


@pytest.mark.skipif(
    os.environ.get("LINEMOD_TPU_HW_TESTS") != "1",
    reason="set LINEMOD_TPU_HW_TESTS=1 to run real-TPU hardware tests",
)
def test_prefilter_cut_parity_on_tpu():
    """The prefiltered exact cut must be bit-identical to the streaming
    exact cut at the 96k-template regime on the real chip (writes
    PREFILTER_PARITY_r05.txt; needs the .bigbank_cache_s3.npz cache)."""
    if not os.path.exists(os.path.join(REPO, ".bigbank_cache_s3.npz")):
        pytest.skip("big-bank cache not generated (scripts/bigbank_bench.py)")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "prefilter_parity.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "MISMATCH" not in out.stdout
    assert "cut_exact proof: True" in out.stdout
