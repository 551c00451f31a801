"""5b_lyrics single-chip decode smoke: prove the 5.4B-param flagship decodes
on ONE TPU v5e via zero-copy staged decode params (raw per-layer weights
never exist on device — the stacked layout alone is ~10.9 GB bf16, so the
in-jit duplicate the unstaged path would create cannot fit).

Run under the default axon env:  python scripts/chip_5b_smoke.py
Appends results to PERF.md-ready JSON on stdout. First run pays host init
(cached via JUKEBOX_INIT_CACHE) and the segment-graph compile.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JUKEBOX_INIT_CACHE", "1")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
    try:
        jax.config.update("jax_platforms", "axon,cpu")
    except Exception:
        pass
    print("device:", jax.devices()[0], flush=True)

    from jukebox_tpu.hparams import setup_hparams
    from jukebox_tpu.lyricdict import poems
    from jukebox_tpu.models.make_models import make_prior, make_vqvae

    sample_length = 8192 * 128
    t0 = time.time()
    vq_hps = setup_hparams("vqvae", dict(sample_length=sample_length,
                                         restore_vqvae=""))
    vqvae = make_vqvae(vq_hps)
    hps = setup_hparams("prior_5b_lyrics", dict(sample_length=sample_length,
                                                restore_prior="",
                                                fp16_params=True))
    prior = make_prior(hps, vqvae)
    n = sum(x.size for x in jax.tree_util.tree_leaves(prior.params))
    print(f"built 5b_lyrics ({n/1e9:.2f}B params) in {time.time()-t0:.0f}s",
          flush=True)

    t0 = time.time()
    prior.stage_decode()
    print(f"staged on device in {time.time()-t0:.0f}s", flush=True)

    bs = int(os.environ.get("SMOKE_BS", "2"))
    n_tok = int(os.environ.get("SMOKE_TOKENS", "512"))
    metas = [dict(artist="unknown", genre="unknown",
                  lyrics=poems["ozymandias"], total_length=240 * vq_hps.sr,
                  offset=0)] * bs
    y = prior.get_y(prior.labeller.get_batch_labels(metas), 0)

    t0 = time.time()
    z = prior.sample(n_samples=bs, z=None, z_conds=None, y=y,
                     rng=jax.random.key(0), fp16=True, temp=0.99,
                     chunk_size=16, sample_tokens=n_tok, segment_tokens=256)
    # copy tokens to host: async readiness cannot fake the timing
    print("first tokens:", np.asarray(z)[0, :4], flush=True)
    t_first = time.time() - t0
    t0 = time.time()
    z = prior.sample(n_samples=bs, z=None, z_conds=None, y=y,
                     rng=jax.random.key(1), fp16=True, temp=0.99,
                     chunk_size=16, sample_tokens=n_tok, segment_tokens=256)
    print("exec tokens:", np.asarray(z)[0, :4], flush=True)
    t_exec = time.time() - t0
    rate = n_tok * bs / t_exec
    out = dict(model="5b_lyrics", params_b=round(n / 1e9, 2), bs=bs,
               tokens=n_tok, first_s=round(t_first, 1),
               exec_s=round(t_exec, 1), tok_per_s=round(rate, 1),
               ms_per_step=round(1e3 * t_exec / n_tok, 1))
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SMOKE_5B.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
