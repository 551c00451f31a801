"""Device mesh and sharding helpers — the TPU-native replacement for the
reference's MPI/NCCL bootstrap (jukebox/utils/dist_utils.py:59-101) and
dist_adapter no-op fallback.

Instead of one process per GPU with explicit collectives, we build a
`jax.sharding.Mesh` over all visible devices and annotate shardings; XLA
inserts the ICI collectives. Single-host, single-device just works (mesh of
one device), mirroring dist_adapter's graceful degradation.
"""

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def setup_dist(hps=None):
    """Initialise multi-host JAX if requested via standard env vars.

    On a single host this is a no-op. Multi-host pods should launch with
    coordinator env vars and call jax.distributed.initialize themselves or
    rely on the TPU auto-bootstrap.
    """
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def make_mesh(mesh_dp=-1, mesh_mp=1, devices=None):
    """Mesh with a data axis (and optional model axis). mesh_dp=-1 means all
    remaining devices."""
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


def shard_batch(mesh, batch):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch)


def replicate(mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)
