"""Checkpoint save/restore for parameter/state pytrees (equivalent of the
reference's save_checkpoint/restore_model, jukebox/make_models.py:41-71).

Native format: a single `.npz`-in-pickle file holding the numpy-ified pytree
plus metadata (hps snapshot, step). Released torch `.pth.tar` checkpoints are
converted through jukebox_tpu.utils.torch_convert on load.
"""

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, payload):
    """payload: dict with arbitrary pytrees (params/state/opt) + metadata."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as f:
        return pickle.load(f)
