"""Hardware kernel parity inside the test suite (VERDICT r2 Next #4).

``pytest tests/`` on a machine with a reachable TPU runs the Mosaic
kernel <-> XLA parity checks (scripts/verify_kernels_tpu.py: fused
backward, line-search, and whole-solve kernels for all five families)
without anyone remembering the script.  On CPU-only machines the test
skips.

The check runs in a SUBPROCESS because (a) the test suite pins this
process to the virtual CPU mesh (conftest.py) and (b) the axon TPU plugin
tolerates exactly one client process at a time — the subprocess is that
one client, launched serially.  Set SKIP_TPU_TESTS=1 to skip explicitly
(e.g. while another TPU job owns the tunnel); TPU_TESTS_TIMEOUT to raise
the limit for cold (uncached) kernel compiles.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "scripts/verify_kernels_tpu.py")


def _tpu_reachable() -> bool:
    """Probe for a TPU in a throwaway subprocess (never in-process: this
    process is pinned to CPU, and backend discovery is one-shot)."""
    if int(os.environ.get("SKIP_TPU_TESTS", "0")):
        return False
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.pop("XLA_FLAGS", None)
    try:
        out = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax; print(jax.devices()[0].platform)",
            ],
            env=env,
            capture_output=True,
            text=True,
            timeout=120,
        )
    except subprocess.TimeoutExpired:
        return False
    return out.returncode == 0 and "tpu" in out.stdout.lower()


def test_kernel_parity_on_tpu():
    """All five families: per-phase + whole-solve kernel parity vs XLA."""
    if not _tpu_reachable():
        pytest.skip("no TPU reachable (or SKIP_TPU_TESTS=1)")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.pop("XLA_FLAGS", None)
    timeout = int(os.environ.get("TPU_TESTS_TIMEOUT", "2400"))
    p = subprocess.run(
        [sys.executable, SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    sys.stdout.write(p.stdout[-4000:])
    assert p.returncode == 0, f"kernel parity FAILED:\n{p.stdout[-4000:]}\n{p.stderr[-2000:]}"
