"""Device mesh and sharding helpers — the TPU-native replacement for the
reference's MPI/NCCL bootstrap (jukebox/utils/dist_utils.py:59-101) and
dist_adapter no-op fallback.

Instead of one process per GPU with explicit collectives, we build a
`jax.sharding.Mesh` over ALL processes' devices and annotate shardings; XLA
inserts the ICI/DCN collectives. Single-host, single-device just works (mesh
of one device), mirroring dist_adapter's graceful degradation.

Multi-process layout: each process runs the same SPMD program over the
global mesh. The input pipeline is host-sharded (ShardedLoader yields this
process's slice of the global batch); `shard_batch` assembles the slices
into one global jax.Array via `jax.make_array_from_process_local_data`, so
a jitted step sees a [global_bs, ...] batch whether there is one process or
many (the reference's DistributedSampler + DDP equivalent, train.py:42-46).
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def setup_dist(hps=None):
    """Multi-process bootstrap (the reference's setup_dist_from_mpi analogue,
    dist_utils.py:59-101, minus MPI: ranks come from env vars).

    Reads the standard JAX coordinator env vars:
      JAX_COORDINATOR_ADDRESS  host:port of process 0's coordinator service
      JAX_NUM_PROCESSES        world size (optional on TPU pods, where the
                               runtime can auto-detect)
      JAX_PROCESS_ID           this process's rank
    and calls jax.distributed.initialize BEFORE any backend use. Absent a
    coordinator address this is a no-op and the process runs single-
    controller over its local devices.
    """
    global _INITIALIZED
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr and not _INITIALIZED:
        kwargs = {"coordinator_address": addr}
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        if nproc is not None:
            kwargs["num_processes"] = int(nproc)
            kwargs["process_id"] = int(os.environ.get("JAX_PROCESS_ID", "0"))
        jax.distributed.initialize(**kwargs)
        _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def make_mesh(mesh_dp=-1, mesh_mp=1, devices=None):
    """Mesh with a data axis (and optional model axis) over ALL processes'
    devices. mesh_dp=-1 means all remaining devices. jax.devices() orders
    process 0's devices first, so with the default (dp, mp) reshape each
    process owns a contiguous block of dp rows — exactly the layout
    shard_batch's per-process batch assembly expects."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_dp == -1:
        assert n % mesh_mp == 0
        mesh_dp = n // mesh_mp
    assert mesh_dp * mesh_mp == n, f"{mesh_dp}x{mesh_mp} != {n} devices"
    arr = np.asarray(devices).reshape(mesh_dp, mesh_mp)
    return Mesh(arr, ("dp", "mp"))


def batch_sharding(mesh):
    return NamedSharding(mesh, P("dp"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _put_global(mesh, tree, spec):
    """Place host data on the (possibly multi-process) mesh with `spec`.
    Single-process: plain device_put. Multi-process: each process
    contributes its addressable shard (for P('dp'), its local slice of the
    batch; for P(), a full replica) and the result is one global jax.Array
    spanning all processes."""
    sharding = NamedSharding(mesh, spec)
    multiproc = jax.process_count() > 1

    def put(x):
        if not multiproc:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def shard_batch(mesh, batch):
    """Per-process local [bs, ...] batch -> global [bs * n_batch_procs, ...]
    array sharded over 'dp' (replicated over 'mp')."""
    return _put_global(mesh, batch, P("dp"))


def replicate(mesh, tree):
    return _put_global(mesh, tree, P())
