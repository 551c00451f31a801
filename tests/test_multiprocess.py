"""Multi-process (multi-controller) training equivalence.

Spawns REAL separate processes — each with its own JAX runtime, local
devices, and host-sharded input slice — connected through
jax.distributed.initialize (coordinator + Gloo CPU collectives), and asserts
the 2-process run over a 2x2-device world produces the same losses and
final parameters as a single process over the same 4-device world.

This is the process-boundary proof the virtual-8-device tests cannot give:
global-batch assembly via jax.make_array_from_process_local_data, the
coordinator bootstrap in parallel/dist.setup_dist, and cross-process
collectives inside the jitted step (grad psum + the codebook-EMA cluster
reductions). Reference equivalent: mpiexec DDP training,
jukebox/utils/dist_utils.py:59-101 + train.py:42-46.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(pid, nproc, port, outdir, local_devices):
    env = os.environ.copy()
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES=str(nproc),
        JAX_PROCESS_ID=str(pid),
        PYTHONPATH=_REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    return subprocess.Popen(
        [sys.executable, _WORKER, str(pid), str(nproc), str(outdir)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def _run_world(nproc, total_devices, outdir):
    port = _free_port()
    procs = [_launch(pid, nproc, port, outdir, total_devices // nproc)
             for pid in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return [np.load(os.path.join(outdir, f"proc{pid}_of_{nproc}.npz"))
            for pid in range(nproc)]


def test_two_process_training_matches_single_process(tmp_path):
    two = _run_world(nproc=2, total_devices=4, outdir=str(tmp_path))
    one = _run_world(nproc=1, total_devices=4, outdir=str(tmp_path))[0]

    assert int(two[0]["n_devices"]) == 4  # both workers saw the global mesh
    # every process of the 2-proc world computes identical replicated results
    np.testing.assert_array_equal(two[0]["losses"], two[1]["losses"])
    np.testing.assert_array_equal(two[0]["digest"], two[1]["digest"])

    # and the 2-process world matches the single-process ground truth
    np.testing.assert_allclose(two[0]["losses"], one["losses"], rtol=1e-6)
    np.testing.assert_allclose(two[0]["gns"], one["gns"], rtol=1e-6)
    np.testing.assert_allclose(two[0]["digest"], one["digest"],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(two[0]["state_digest"], one["state_digest"],
                               rtol=1e-6, atol=1e-8)
