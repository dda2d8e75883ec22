"""Multi-process distributed training (SURVEY.md §5.8): 2 local processes
x 4 virtual CPU devices each train the sharded CWGAN-GP step over one
8-device global mesh, in lockstep with a single-process 8-device run.

The reference has no distributed backend (single process, train.py:102);
this validates the framework's jax.distributed wiring the same way the
reference validates hardware without an FPGA — simulated topology.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "distributed_worker.py"
REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env():
    env = os.environ.copy()
    # the workers pick their own platform/device-count via jax.config
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_worker(args, env):
    return subprocess.Popen(
        [sys.executable, str(WORKER)] + args,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )


def _result(proc, timeout=420):
    out, _ = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, out[-3000:]
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in worker output:\n{out[-3000:]}")


def test_two_process_lockstep_with_single_process():
    port = _free_port()
    env = _clean_env()
    common = ["--coordinator", f"localhost:{port}", "--num_processes", "2",
              "--local_devices", "4", "--steps", "3"]
    p0 = _run_worker(common + ["--process_id", "0"], env)
    p1 = _run_worker(common + ["--process_id", "1"], env)
    r0, r1 = _result(p0), _result(p1)

    assert r0["process_count"] == 2 and r1["process_count"] == 2
    assert r0["global_devices"] == 8 and r1["global_devices"] == 8
    assert r0["step"] == 3
    # both processes hold identical replicated parameters
    assert r0["checksum"] == r1["checksum"]
    assert r0["d_loss"] == r1["d_loss"] and r0["g_loss"] == r1["g_loss"]

    # lockstep with a single-process run over the same 8-device mesh: the
    # datagen keys fold GLOBAL device coordinates, so process layout must
    # not change the math
    base = _result(_run_worker(
        ["--process_id", "-1", "--num_processes", "2", "--local_devices", "4",
         "--steps", "3"], env))
    assert base["global_devices"] == 8
    np.testing.assert_allclose(r0["checksum"], base["checksum"], rtol=1e-6)
    np.testing.assert_allclose(r0["d_loss"], base["d_loss"], rtol=1e-5)
    np.testing.assert_allclose(r0["g_loss"], base["g_loss"], rtol=1e-5)


def test_two_process_gspmd_tensor_parallel():
    """GSPMD dp x tp over a 2-process mesh: tensor-parallel full-U-Net
    kernels with compiler-inserted collectives, lockstep with the
    single-process partitioning of the same global mesh."""
    port = _free_port()
    env = _clean_env()
    common = ["--coordinator", f"localhost:{port}", "--num_processes", "2",
              "--local_devices", "4", "--steps", "2", "--strategy", "gspmd"]
    p0 = _run_worker(common + ["--process_id", "0"], env)
    p1 = _run_worker(common + ["--process_id", "1"], env)
    r0, r1 = _result(p0), _result(p1)
    assert r0["global_devices"] == 8 and r0["step"] == 2
    np.testing.assert_allclose(r0["checksum"], r1["checksum"], rtol=1e-6)

    base = _result(_run_worker(
        ["--process_id", "-1", "--num_processes", "2", "--local_devices", "4",
         "--steps", "2", "--strategy", "gspmd"], env))
    np.testing.assert_allclose(r0["checksum"], base["checksum"], rtol=1e-5)
    np.testing.assert_allclose(r0["g_loss"], base["g_loss"], rtol=1e-4)
