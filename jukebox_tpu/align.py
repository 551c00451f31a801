"""Lyric-music alignment from attention weights — TPU equivalent of
jukebox/align.py. Re-runs the top prior's teacher-forced forward per hop with
attention recording at (alignment_layer, alignment_head), and stitches the
per-hop (n_ctx, n_tokens) attention maps into a full
(total_length, n_lyric_chars) alignment using each hop's lyric-window source
indices (align.py:15-83)."""

import os
import time

import numpy as np

import jax.numpy as jnp

from jukebox_tpu.hparams import Hyperparams
from jukebox_tpu.utils.cli import fire
from jukebox_tpu.utils.misc import vlog, yield_to_transfers
from jukebox_tpu.utils.sample_utils import get_starts


def get_alignment(x, zs, labels, prior, fp16, hps):
    level = hps.levels - 1  # top level
    n_ctx, n_tokens = prior.n_ctx, prior.n_tokens
    z = np.asarray(zs[level])
    bs, total_length = z.shape[0], z.shape[1]
    if total_length < n_ctx:
        padding_length = n_ctx - total_length
        z = np.concatenate(
            [z, np.zeros((bs, n_ctx - total_length), dtype=z.dtype)], axis=1)
        total_length = z.shape[1]
    else:
        padding_length = 0

    hop_length = int(hps.hop_fraction[level] * prior.n_ctx)
    alignment_head, alignment_layer = prior.alignment_head, prior.alignment_layer
    attn_layers = {alignment_layer}
    alignment_hops, indices_hops = {}, {}

    t = time.time()
    if hasattr(prior, "to_device"):
        prior.to_device()  # reference: prior.cuda() (align.py:34)
    vlog(f"[align] to_device {time.time() - t:.1f}s")

    try:
        for start in get_starts(total_length, n_ctx, hop_length):
            end = start + n_ctx
            y, indices_hop = prior.get_y(labels, start, get_indices=True)
            assert len(indices_hop) == bs
            for indices in indices_hop:
                assert len(indices) == n_tokens

            # one batched attention-recording forward per hop (the reference
            # batches the hop the same way, align.py:42-59).
            # JUKEBOX_ALIGN_BS=<n> microbatches the hop over samples: at 5B
            # scale the raw params alone are ~11 GB of a 16 GB chip, so the
            # bs=16 recording forward's activations may need bounding.
            t = time.time()
            mb = int(os.environ.get("JUKEBOX_ALIGN_BS", "0")) or bs
            parts = []
            y_np = np.asarray(y)
            for i in range(0, bs, mb):
                yield_to_transfers()  # bulk weight stages drain first
                w_hop = prior.z_forward(jnp.asarray(z[i:i + mb, start:end]),
                                        [], y_np[i:i + mb], fp16=fp16,
                                        get_attn_weights=attn_layers,
                                        attn_head=alignment_head)
                assert len(w_hop) == 1
                yield_to_transfers()  # the D2H below also wedges mid-stage
                parts.append(np.asarray(w_hop[0], dtype=np.float32))
            alignment_hop = parts[0] if len(parts) == 1 else \
                np.concatenate(parts, axis=0)
            vlog(f"[align] hop @{start} fwd {time.time() - t:.1f}s (mb={mb})")
            assert alignment_hop.shape == (bs, n_ctx, n_tokens)

            indices_hops[start] = indices_hop
            alignment_hops[start] = alignment_hop
    finally:
        # ALWAYS release the staged raw params: a failed hop forward (the
        # remote-compile helper 500-ing on the 79L recording graph) left
        # 11.2 GB staged and OOM'd the level-0 vqvae decode behind it
        # (measured, r5 5b cascade run 5)
        if hasattr(prior, "to_host"):
            prior.to_host()

    # stitch hops into the full alignment per item
    alignments = []
    for item in range(bs):
        full_tokens = labels["info"][item]["full_tokens"]
        alignment = np.zeros((total_length, len(full_tokens) + 1))
        for start in reversed(get_starts(total_length, n_ctx, hop_length)):
            end = start + n_ctx
            alignment_hop = alignment_hops[start][item]
            indices = indices_hops[start][item]
            alignment[start:end, indices] = alignment_hop
        # drop token padding and the trailing pad index
        alignment = alignment[: total_length - padding_length, :-1]
        alignments.append(alignment)
    return alignments


def save_alignment(model, device, hps):
    import pickle

    from jukebox_tpu.models.make_models import make_model
    from jukebox_tpu.save_html import save_html

    vqvae, priors = make_model(model, device, hps, levels=[-1])
    logdir = f"{hps.logdir}/level_0"
    with open(f"{logdir}/data.jkb", "rb") as f:
        data = pickle.load(f)
    fp16 = model != "1b_lyrics"
    data["alignments"] = get_alignment(data["x"], data["zs"], data["labels"][-1],
                                       priors[-1], fp16, hps)
    with open(f"{logdir}/data_align.jkb", "wb") as f:
        pickle.dump(data, f)
    save_html(logdir, data["x"], data["zs"], data["labels"][-1],
              data["alignments"], hps)


def run(model, port=29500, **kwargs):
    hps = Hyperparams(**kwargs)
    save_alignment(model, None, hps)


if __name__ == "__main__":
    fire(run)
