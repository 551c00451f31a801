"""Probe: is block_until_ready trustworthy for queued segment executions on
the axon transport, and do staged bs=16 segments actually execute? Times
each segment two ways (block_until_ready vs np.asarray host copy) and checks
token sanity. Uses the 1b top prior from the init cache."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JUKEBOX_INIT_CACHE", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
    try:
        jax.config.update("jax_platforms", "axon,cpu")
    except Exception:
        pass
    print("device:", jax.devices()[0], flush=True)

    from jukebox_tpu.hparams import setup_hparams
    from jukebox_tpu.lyricdict import poems
    from jukebox_tpu.models.make_models import make_prior, make_vqvae

    sample_length = 6144 * 128
    vq_hps = setup_hparams("vqvae", dict(sample_length=sample_length,
                                         restore_vqvae=""))
    vqvae = make_vqvae(vq_hps)
    prior = make_prior(setup_hparams("prior_1b_lyrics",
                                     dict(sample_length=sample_length,
                                          restore_prior="",
                                          fp16_params=True)), vqvae)
    t0 = time.time()
    prior.stage_decode()
    print(f"staged in {time.time()-t0:.0f}s", flush=True)

    bs = int(os.environ.get("PROBE_BS", "16"))
    metas = [dict(artist="unknown", genre="unknown",
                  lyrics=poems["ozymandias"], total_length=240 * vq_hps.sr,
                  offset=0)] * bs
    y = jnp.asarray(prior.get_y(prior.labeller.get_batch_labels(metas), 0))

    call_params, dec = prior._staged_light, prior._staged_dec
    t0 = time.time()
    caches, x_tok, x_cond, y_cond, enc = jax.block_until_ready(
        prior._sample_init(call_params, bs, z=None, z_conds=None, y=y,
                           fp16=True, chunk_size=32, dec_params=dec))
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    t = prior.model.sample_prefix_len(None)
    for i in range(4):
        t0 = time.time()
        seg, caches, x_tok = prior._sample_segment(
            call_params, caches, x_tok, np.int32(t), 512, jax.random.key(0),
            x_cond=x_cond, y_cond=y_cond, encoder_kv=enc, fp16=True,
            temp=0.99, top_k=0, top_p=0.0, dec_params=dec)
        jax.block_until_ready(seg)
        t_block = time.time() - t0
        t0 = time.time()
        host = np.asarray(seg)
        t_copy = time.time() - t0
        uniq = len(np.unique(host))
        print(f"seg {i} @t={t}: block={t_block:.2f}s +copy={t_copy:.2f}s "
              f"uniq_tokens={uniq} head={host[0, :4].tolist()}", flush=True)
        t += 512


if __name__ == "__main__":
    main()
