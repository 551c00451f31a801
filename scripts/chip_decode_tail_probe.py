"""Decode-tail A/B probe (VERDICT r3 #6): measure the vqvae decode of a
full-length cascade output at chunk bs in {1,2,4,8,16}, NEXT TO the HBM
residents it actually shares the chip with during a cascade finalize —
the level-0 upsampler's staged int8 decode weights and a live set of ring
caches from a real sample_init. Round 3's f51c47d dropped the default
from bs=4 to bs=2 on a single stalled window with no A/B; this probe
replaces that guess with wall time per level per chunk size.

The decode under test is exactly _decode_save_level's call
(sample.py: prior.decode(zs[level:], start_level=level,
bs_chunks=ceil(bs/chunk))), reference knob: bs_chunks in
jukebox/vqvae/vqvae.py:115-144.

Usage: python scripts/chip_decode_tail_probe.py [BS] [CHUNKS csv]
Writes scripts/out/decode_tail_probe.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JUKEBOX_INIT_CACHE", "1")
os.environ.setdefault("JUKEBOX_STAGE_CACHE", "1")
os.environ.setdefault("JUKEBOX_INT8_DECODE", "1")
os.environ.setdefault("JUKEBOX_VERBOSE", "1")

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
CHUNKS = ([int(c) for c in sys.argv[2].split(",")]
          if len(sys.argv) > 2 else [1, 2, 4, 8, 16])

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
try:
    jax.config.update("jax_platforms", "axon,cpu")
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from jukebox_tpu.hparams import setup_hparams
from jukebox_tpu.models.make_models import make_prior, make_vqvae


def stats(tag):
    try:
        m = jax.devices()[0].memory_stats() or {}
        print(f"[mem] {tag}: in_use {m.get('bytes_in_use', 0) / 1e9:.2f} GB, "
              f"peak {m.get('peak_bytes_in_use', 0) / 1e9:.2f} GB", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[mem] {tag}: stats unavailable ({e})", flush=True)


sample_length = 6144 * 128  # one full 1b top window, the bench unit
vq_hps = setup_hparams("vqvae", dict(sample_length=sample_length,
                                     restore_vqvae=""))
vqvae = make_vqvae(vq_hps)
sr = vq_hps.sr

# cascade-realistic residents: level-0 upsampler staged int8 + live rings
prior = make_prior(setup_hparams("upsampler_level_0", dict(
    sample_length=sample_length, restore_prior="", fp16_params=True)), vqvae)
t0 = time.time()
prior.stage_decode()
print(f"staged level-0 upsampler in {time.time() - t0:.0f}s", flush=True)
stats("after staging")

n_cond = prior.n_ctx // prior.cond_downsample
metas = [dict(artist="unknown", genre="unknown", lyrics="",
              total_length=240 * sr, offset=0)] * BS
y = jnp.asarray(prior.get_y(prior.labeller.get_batch_labels(metas), 0))
z_conds = [jnp.zeros((BS, n_cond), jnp.int32)]
t0 = time.time()
live = prior._sample_init(prior._staged_light, BS, z=None, z_conds=z_conds,
                          y=y, fp16=True, chunk_size=256,
                          dec_params=prior._staged_dec)
live = jax.block_until_ready(live)
print(f"live ring caches allocated in {time.time() - t0:.0f}s", flush=True)
stats("staged weights + live rings")

# full-length codes for every level (token counts of a finished cascade)
rs = np.random.RandomState(0)
raw_per_level = (8, 32, 128)
zs = [jnp.asarray(rs.randint(0, vq_hps.l_bins,
                             (BS, sample_length // r)), jnp.int32)
      for r in raw_per_level]

out = dict(bs=BS, sample_length=sample_length, levels={})
for level in (0, 1, 2):
    rows = {}
    for chunk in CHUNKS:
        if chunk > BS:
            continue
        bs_chunks = -(-BS // chunk)
        try:
            # warm the compile for this (chunk, level) shape first
            _ = np.asarray(vqvae.decode([z[:chunk] for z in zs[level:]],
                                        start_level=level, bs_chunks=1))
            t0 = time.time()
            x = vqvae.decode(zs[level:], start_level=level,
                             bs_chunks=bs_chunks)
            x_np = np.asarray(x)  # host readback, like _decode_save_level
            dt = time.time() - t0
            rows[chunk] = round(dt, 2)
            print(f"level {level} chunk_bs={chunk} ({bs_chunks} calls): "
                  f"{dt:.1f}s  ({x_np.shape})", flush=True)
            stats(f"level {level} chunk {chunk}")
        except Exception as e:  # noqa: BLE001 — OOM is a result here
            rows[chunk] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
            print(f"level {level} chunk_bs={chunk}: FAILED {e}", flush=True)
    out["levels"][level] = rows

os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "out"),
            exist_ok=True)
path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "out", "decode_tail_probe.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {path}", flush=True)
print("OK", flush=True)
