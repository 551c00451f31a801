"""Small tree/param helpers (equivalent of jukebox/utils/torch_utils.py)."""

import contextlib
import os
import sys
import threading

import jax
import numpy as np

# ---------------------------------------------------------------------------
# Tunnel transfer priority gate. Over the axon remote transport every
# dispatch and buffer write shares one FIFO'd connection: a bulk host->HBM
# weight transfer issued while decode threads stream segment dispatches gets
# ~2 MB/s (each chunk queues behind seconds of enqueued compute) vs
# ~500 MB/s idle. Rather than let a 2 s transfer take 300+ s, bulk transfers
# announce themselves and the dispatch loops (decode segments, vqvae decode
# chunks, alignment hops) pause issuing new work until the transfer drains —
# a few seconds of decode stall instead of minutes of staging stall.
# ---------------------------------------------------------------------------
_XFER_CV = threading.Condition()
_XFER_COUNT = 0


@contextlib.contextmanager
def tunnel_transfer():
    """Marks a bulk host<->HBM transfer; dispatch loops yield until done."""
    global _XFER_COUNT
    with _XFER_CV:
        _XFER_COUNT += 1
    try:
        yield
    finally:
        with _XFER_CV:
            _XFER_COUNT -= 1
            _XFER_CV.notify_all()


def yield_to_transfers():
    """Called by dispatch loops before enqueuing device work: blocks while
    any bulk transfer is pending so it gets the tunnel to itself."""
    with _XFER_CV:
        while _XFER_COUNT:
            _XFER_CV.wait(timeout=1.0)




def vlog(msg):
    """Debug-level instrumentation line to stderr; silent unless
    JUKEBOX_VERBOSE=1 (bench.py sets it — library callers stay quiet)."""
    if os.environ.get("JUKEBOX_VERBOSE"):
        print(msg, file=sys.stderr, flush=True)


def count_parameters(params):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def count_state(state):
    return count_parameters(state)


def assert_shape(x, exp_shape):
    assert tuple(x.shape) == tuple(exp_shape), f"Expected {exp_shape} got {x.shape}"


def param_bytes(params):
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
