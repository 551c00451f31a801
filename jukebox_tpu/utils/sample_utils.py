"""Host-side window math for the sampling cascade (equivalent of
jukebox/utils/sample_utils.py)."""

import numpy as np


def split_batch(obj, n_samples, split_size):
    """Split array/list-of-arrays/None into microbatches of split_size rows
    (sample_utils.py:3-12)."""
    n_passes = (n_samples + split_size - 1) // split_size
    if obj is None:
        return [None] * n_passes
    if isinstance(obj, (list, tuple)):
        splits = [split_batch(item, n_samples, split_size) for item in obj]
        return [list(group) for group in zip(*splits)]
    return [obj[i * split_size:(i + 1) * split_size] for i in range(n_passes)]


def get_starts(total_length, n_ctx, hop_length):
    """Window start offsets; the last window is right-aligned to keep full
    context (sample_utils.py:15-22)."""
    starts = []
    for start in range(0, total_length - n_ctx + hop_length, hop_length):
        if start + n_ctx >= total_length:
            start = total_length - n_ctx
        starts.append(start)
    return starts
