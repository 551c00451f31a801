"""Why does the persistent compile cache miss on every bench run?

Lowers the 1b top prior's jitted sample_init / sample_segment with the exact
full-cascade shapes, entirely host-side (device transfers are monkeypatched
out), and writes the HLO text to a file. Run twice in separate processes and
diff the outputs — any per-process constant baked into the HLO (the thing
that changes the persistent-cache key) shows up in the diff.

Usage: python scripts/hlo_fingerprint.py /tmp/hlo_run1
"""
import hashlib
import os
import sys
import time

os.environ.setdefault("JUKEBOX_INIT_CACHE", "1")
os.environ.setdefault("JUKEBOX_STAGE_CACHE", "1")
os.environ.setdefault("JUKEBOX_VERBOSE", "1")

import numpy as np

import jax

out_prefix = sys.argv[1]

from jukebox_tpu.hparams import setup_hparams
from jukebox_tpu.lyricdict import poems
from jukebox_tpu.models import make_models
from jukebox_tpu.models.make_models import MODELS, make_prior, make_vqvae
from jukebox_tpu.models.vqvae import calculate_strides

# keep every tree host-side: lowering only needs avals, and the probe must
# not touch the (slow, flaky) tunnel
make_models._gated_device_put = lambda tree, **kw: tree
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
t = time.time()
vqvae = make_vqvae(vq_hps)
print(f"vqvae built {time.time()-t:.1f}s", file=sys.stderr)

t = time.time()
prior = make_prior(setup_hparams(
    prior_names[-1], dict(sample_length=sample_length, restore_prior="",
                          fp16_params=True)), vqvae)
print(f"top prior built {time.time()-t:.1f}s", file=sys.stderr)
t = time.time()
prior.stage_decode(quantize="int8")
print(f"staged {time.time()-t:.1f}s", file=sys.stderr)

bs = 16
total_length = 240 * vq_hps.sr
metas = [dict(artist="unknown", genre="unknown", lyrics=poems["ozymandias"],
              total_length=total_length, offset=0)] * bs
labels = prior.labeller.get_batch_labels(metas)
y = np.asarray(prior.get_y(labels, 0))

call_params, dec = prior._staged_light, prior._staged_dec

lowered = prior._sample_init_jit.lower(
    call_params, bs, z=None, z_conds=None, y=y, fp16=True, chunk_size=32,
    dec_params=dec, prefill_mb=None, cond_bs1=True)
txt = lowered.as_text()
with open(out_prefix + "_sample_init.hlo", "w") as f:
    f.write(txt)
print("sample_init hlo sha:",
      hashlib.sha256(txt.encode()).hexdigest()[:16],
      f"({len(txt)} chars)", file=sys.stderr)
