"""Multi-host (2-process) smoke test on virtual CPU devices.

The reference has no distributed layer at all (SURVEY.md §2.9); this is the
TPU-build extension: two coordinator-connected processes, 4 virtual devices
each, train the same scene over a process-spanning (2, 4) mesh — data axis
across processes (the DCN analogue), gs axis within — and must agree with a
single-process run of the identical program on an 8-device mesh.

Exercises: jax.distributed bootstrap, make_multihost_mesh layout,
process-local batch feeding (put_batch), replicated pool placement
(put_replicated), cross-process gradient psum, densify + reshard_like, and
the Pallas backend's shard_map boundary under multi-process GSPMD.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
WORKER = REPO / "tests" / "multihost_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(pid, port, nproc=2):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}{env.get('PYTHONPATH', '')}"
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(pid), str(port), str(nproc)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True,
    )


def _result(proc, timeout=600):
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"worker failed:\n{out}\n{err}"
    return json.loads(out.strip().splitlines()[-1])


@pytest.mark.slow
def test_two_process_training_matches_single():
    port = _free_port()
    p0 = _spawn(0, port)
    p1 = _spawn(1, port)
    single = _spawn(-1, port)
    r0, r1, rs = _result(p0), _result(p1), _result(single)

    # both distributed processes observe identical (replicated) state
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0, atol=0)
    assert r0["n_alive"] == r1["n_alive"]
    # and the distributed run reproduces the single-process program
    # (same mesh shape, same batches; only collective scheduling differs)
    np.testing.assert_allclose(r0["losses"], rs["losses"], atol=1e-5)
    assert r0["n_alive"] == rs["n_alive"]
    # collective-free checkpoint fetch on process 0 only (would deadlock if
    # fetch_to_host hid a collective) reproduces the single-process pool
    assert r0["checksum"] is not None and r1["checksum"] is None
    np.testing.assert_allclose(r0["checksum"], rs["checksum"], rtol=1e-5)
