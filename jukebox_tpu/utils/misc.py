"""Small tree/param helpers (equivalent of jukebox/utils/torch_utils.py)."""

import os
import sys

import jax
import numpy as np


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
