"""Executed multi-process path (VERDICT r2 Missing #2 / Next #3a).

Launches TWO separate OS processes that run ``parallel/distributed.py`` for
real: ``jax.distributed.initialize`` over a local coordinator, a global
mesh spanning both processes' CPU devices (Gloo collectives — the DCN
emulation), ``host_local_batch`` in its non-trivial branch, per-host
``make_array_from_process_local_data`` feeding, and globally-psum'd
FleetStats.  Asserts:

* both processes see identical global FleetStats every step (the psum
  genuinely crossed the process boundary);
* the assembled 2-process global action sequence matches a single-process
  vmap reference on the same scenario set (sharding changes nothing);
* ``host_local_batch`` sliced the batch disjointly and completely.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "scripts/multiproc_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_run(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mp"))
    port = _free_port()
    env = dict(os.environ)
    # children pick their own platform/flags; drop the parent's virtual-mesh
    # XLA_FLAGS so each worker forces exactly MP_DEVS_PER_PROC devices
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), outdir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return outdir, outs


def test_workers_formed_one_job(two_process_run):
    outdir, _ = two_process_run
    for pid in (0, 1):
        d = np.load(os.path.join(outdir, f"proc{pid}.npz"))
        assert int(d["process_count"]) == 2
        assert int(d["n_devices"]) == 4  # 2 procs x 2 forced host devices


def test_global_stats_agree_across_processes(two_process_run):
    outdir, _ = two_process_run
    s0 = np.load(os.path.join(outdir, "proc0.npz"))["stats"]
    s1 = np.load(os.path.join(outdir, "proc1.npz"))["stats"]
    # FleetStats are psum/pmax/pmean over the GLOBAL mesh: identical views
    np.testing.assert_array_equal(s0, s1)
    n_total = s0[0, 1]
    assert n_total == 16  # the full global batch was counted exactly once


def test_sharded_matches_single_process_reference(two_process_run, tmp_path):
    """The 2-process sharded run must reproduce a single-process run of the
    same scenario set (run in an identical worker environment: CPU, x64
    off, same virtual devices) — sharding over processes changes nothing."""
    outdir, _ = two_process_run
    a0 = np.load(os.path.join(outdir, "proc0.npz"))["actions"]  # (K, 8, nu)
    a1 = np.load(os.path.join(outdir, "proc1.npz"))["actions"]
    acts = np.concatenate([a0, a1], axis=1)  # (K, 16, nu)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    ref_dir = str(tmp_path)
    p = subprocess.run(
        [sys.executable, WORKER, "0", "1", "0", ref_dir],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=300,
    )
    assert p.returncode == 0, f"reference worker failed:\n{p.stdout[-3000:]}"
    ref = np.load(os.path.join(ref_dir, "proc0.npz"))
    assert int(ref["process_count"]) == 1
    np.testing.assert_allclose(
        acts, ref["actions"], rtol=1e-6, atol=1e-7
    )
    # global stats identical too (psum over 4 devices == over 2 devices)
    s0 = np.load(os.path.join(outdir, "proc0.npz"))["stats"]
    np.testing.assert_allclose(s0, ref["stats"], rtol=1e-6, atol=1e-6)
