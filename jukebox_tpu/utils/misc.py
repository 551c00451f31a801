"""Small tree/param helpers (equivalent of jukebox/utils/torch_utils.py)."""

import jax
import numpy as np


def count_parameters(params):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def count_state(state):
    return count_parameters(state)


def assert_shape(x, exp_shape):
    assert tuple(x.shape) == tuple(exp_shape), f"Expected {exp_shape} got {x.shape}"


def param_bytes(params):
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
