"""Interactive co-composition workflow — script equivalent of the reference's
Interacting_with_Jukebox.ipynb: load a model family, generate a short
top-level continuation loop with sample_partial_window, then upsample and
write wav/html.

Run (tiny demo sizes; swap the hps names for 1b_lyrics etc. with real
checkpoints cached):
    python examples/interacting.py --audio=/path/to/prompt.wav
"""

import numpy as np

import jax

from jukebox_tpu.hparams import Hyperparams, setup_hparams
from jukebox_tpu.models.make_models import make_prior, make_vqvae
from jukebox_tpu.sample import (_sample, sample_partial_window)
from jukebox_tpu.utils.cli import fire


def run(audio=None, n_samples=2, out="co_compose", seconds_per_chunk=1):
    # tiny demo family (replace with setup_hparams('vqvae'...), 'prior_1b_lyrics')
    vq_hps = setup_hparams("teeny", dict(
        sample_length=4096, sr=8000, levels=2, downs_t=(2, 1), strides_t=(2, 2),
        emb_width=16, l_bins=64, l_mu=0.99, commit=0.02, width=8, depth=2,
        m_conv=1.0, dilation_growth_rate=1))
    vqvae = make_vqvae(vq_hps)
    top = make_prior(setup_hparams("teeny", dict(
        sample_length=512, sr=8000, level=1, levels=2, labels=False,
        n_ctx=64, prior_width=64, prior_depth=4, heads=2, attn_order=2,
        blocks=8, init_scale=0.7, min_duration=1.0, max_duration=600.0)), vqvae)
    ups = make_prior(setup_hparams("teeny", dict(
        sample_length=512, sr=8000, level=0, levels=2, labels=False,
        n_ctx=128, prior_width=64, prior_depth=4, heads=2, attn_order=2,
        blocks=8, init_scale=0.7, cond_width=16, cond_depth=2,
        cond_dilation_growth_rate=1, min_duration=1.0, max_duration=600.0)), vqvae)
    priors = [ups, top]

    hps = Hyperparams(n_samples=n_samples, sample_length=4096, sr=8000,
                      hop_fraction=(0.5, 0.5), levels=2, n_tokens=0, name=out,
                      seed=42)
    kwargs = dict(temp=0.98, fp16=False, chunk_size=8, max_batch_size=n_samples)
    labels = [p.labeller.get_batch_labels([{}] * n_samples) for p in priors]

    # --- co-composition: extend the top level chunk by chunk -----------------
    if audio:
        from jukebox_tpu.sample import load_prompts
        x = load_prompts([audio], duration=1024, hps=hps)
        zs = priors[-1].encode(x, start_level=0, end_level=2, bs_chunks=1)
        zs = [np.asarray(z) for z in zs]
    else:
        zs = [np.zeros((n_samples, 0), dtype=np.int64) for _ in priors]

    tokens_per_chunk = seconds_per_chunk * hps.sr // top.raw_to_tokens
    total_top = hps.sample_length // top.raw_to_tokens
    rng = jax.random.key(0)
    step = 0
    while zs[1].shape[1] < total_top:
        to_sample = min(tokens_per_chunk, total_top - zs[1].shape[1])
        print(f"extending top level by {to_sample} tokens "
              f"({zs[1].shape[1]}/{total_top})")
        zs = sample_partial_window(zs, labels[1], dict(kwargs), 1, top,
                                   to_sample, hps, jax.random.fold_in(rng, step))
        step += 1

    # --- upsample the finished top level to audio ----------------------------
    zs = _sample(zs, labels, [dict(kwargs), dict(kwargs)], priors, [0], hps)
    print(f"wrote {out}/level_0/item_*.wav")


if __name__ == "__main__":
    fire(run)
