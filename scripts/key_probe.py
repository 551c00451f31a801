"""Compile the top prior's sample_init on axon with per-component cache-key
logging. Run twice (separate processes): the second should HIT the persistent
cache; if it misses, the per-component hash log shows which key component
(computation / XLA flags / compile_options / accelerator_config) diverged.

Usage: python scripts/key_probe.py
"""
import logging
import os
import sys
import time

os.environ.setdefault("JUKEBOX_INIT_CACHE", "1")
os.environ.setdefault("JUKEBOX_STAGE_CACHE", "1")

import numpy as np

import jax

cache_dir = "/tmp/key_probe_cache"
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_explain_cache_misses", True)
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

# initialise the axon backend BEFORE heavy model building (registration is
# flaky; retry), so eager ops during init find it registered
for attempt in range(5):
    try:
        print("devices:", jax.devices(), file=sys.stderr)
        break
    except RuntimeError as e:
        print(f"device query failed ({e}); retry in 30s", file=sys.stderr)
        time.sleep(30)

from jukebox_tpu.hparams import setup_hparams
from jukebox_tpu.lyricdict import poems
from jukebox_tpu.models import make_models
from jukebox_tpu.models.make_models import MODELS, make_prior, make_vqvae
from jukebox_tpu.models.vqvae import calculate_strides

# params stay host-side numpy; compile doesn't need device buffers and the
# tunnel is slow
make_models._gated_device_put = lambda tree, **kw: tree
_real_device_put = jax.device_put
jax.device_put = lambda x, *a, **kw: x

model = os.environ.get("BENCH_MODEL", "1b_lyrics")
vqvae_name, *prior_names = MODELS[model]
top_hps = setup_hparams(prior_names[-1], dict(sample_length=0))
vq_hps = setup_hparams(vqvae_name, dict(sample_length=0, restore_vqvae=""))
downsamples = calculate_strides(vq_hps.strides_t, vq_hps.downs_t)
raw_per_level = [int(np.prod(downsamples[: l + 1]))
                 for l in range(len(downsamples))]
sample_length = top_hps.n_ctx * raw_per_level[-1]
vq_hps.sample_length = sample_length
vqvae = make_vqvae(vq_hps)
prior = make_prior(setup_hparams(
    prior_names[-1], dict(sample_length=sample_length, restore_prior="",
                          fp16_params=True)), vqvae)
prior.stage_decode(quantize="int8")

bs = 16
total_length = 240 * vq_hps.sr
metas = [dict(artist="unknown", genre="unknown", lyrics=poems["ozymandias"],
              total_length=total_length, offset=0)] * bs
labels = prior.labeller.get_batch_labels(metas)
y = np.asarray(prior.get_y(labels, 0))

lowered = prior._sample_init_jit.lower(
    prior._staged_light, bs, z=None, z_conds=None, y=y, fp16=True,
    chunk_size=32, dec_params=prior._staged_dec, prefill_mb=None,
    cond_bs1=True)
print("lowered; compiling on", jax.devices()[0], file=sys.stderr)
t = time.time()
compiled = lowered.compile()
print(f"compile wall: {time.time() - t:.1f}s", file=sys.stderr)
print("cache files:", sorted(os.listdir(cache_dir)), file=sys.stderr)
