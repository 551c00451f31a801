"""HBM accounting for big-batch hop windows: build the 1b upsampler, stage
int8, run ONE sample_init (hop prefill) + ONE decode segment at BS samples,
printing device memory stats at each stage.

Usage: python scripts/chip_hop_probe.py [BS] [PREFILL_MB]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JUKEBOX_INIT_CACHE", "1")
os.environ.setdefault("JUKEBOX_INT8_DECODE", "1")

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
MB = int(sys.argv[2]) if len(sys.argv) > 2 else 4
os.environ["JUKEBOX_PREFILL_MB"] = str(MB)

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
        used = m.get("bytes_in_use", 0) / 1e9
        peak = m.get("peak_bytes_in_use", 0) / 1e9
        print(f"[mem] {tag}: in_use {used:.2f} GB, peak {peak:.2f} GB",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[mem] {tag}: stats unavailable ({e})", flush=True)


sample_length = 8192 * 128
vq_hps = setup_hparams("vqvae", dict(sample_length=sample_length,
                                     restore_vqvae=""))
vqvae = make_vqvae(vq_hps)
prior = make_prior(setup_hparams("upsampler_level_1", dict(
    sample_length=sample_length, restore_prior="", fp16_params=True)), vqvae)
stats("after build")
t0 = time.time()
prior.stage_decode()
print(f"staged in {time.time()-t0:.0f}s", flush=True)
stats("after int8 staging")

n_cond = prior.n_ctx // prior.cond_downsample
hop = prior.n_ctx // 2
rs = np.random.RandomState(0)
z = jnp.asarray(rs.randint(0, 2048, (BS, hop)), jnp.int32)
z_conds = [jnp.zeros((BS, n_cond), jnp.int32)]
metas = [dict(artist="unknown", genre="unknown", lyrics="",
              total_length=240 * vq_hps.sr, offset=0)] * BS
y = jnp.asarray(prior.get_y(prior.labeller.get_batch_labels(metas), 0))
stats("inputs staged")

t0 = time.time()
state = prior._sample_init(prior._staged_light, BS, z=z, z_conds=z_conds,
                           y=y, fp16=True, chunk_size=256,
                           dec_params=prior._staged_dec, prefill_mb=MB)
jax.block_until_ready(state)
print(f"sample_init (hop prefill, mb={MB}) ok in {time.time()-t0:.0f}s",
      flush=True)
stats("after sample_init")

caches, x_tok, x_cond, y_cond, encoder_kv = state
seg_tok = 256
times = []
t = hop
for i in range(4):
    t0 = time.time()
    seg, caches, x_tok = prior._sample_segment(
        prior._staged_light, caches, x_tok, np.int32(t), seg_tok,
        jax.random.key(0), x_cond=x_cond, y_cond=y_cond,
        encoder_kv=encoder_kv, fp16=True, temp=0.99,
        dec_params=prior._staged_dec)
    tok = np.asarray(seg)  # host readback: timings can't be faked
    dt = time.time() - t0
    times.append(dt)
    t += seg_tok
    print(f"segment {i}: {dt:.1f}s ({seg_tok / dt:.0f} steps/s, "
          f"{BS * seg_tok / dt:.0f} tok/s batch) tok[0,:3]={tok[0,:3]}",
          flush=True)
steady = times[1:]
rate = BS * seg_tok / (sum(steady) / len(steady))
print(f"steady hop decode: {rate:.0f} tok/s at bs={BS} "
      f"(first segment {times[0]:.1f}s includes megakernel compile)",
      flush=True)
stats("after decode segments")
print("OK", flush=True)
