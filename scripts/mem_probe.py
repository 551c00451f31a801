"""Probe the compiled HBM footprint of the decode-segment graph at a given
batch size, without running it: lower sample_segment with abstract shapes and
print XLA's memory analysis. Usage:

    python scripts/mem_probe.py [bs] [model] [phase]

phase: top (default) or up.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JUKEBOX_INIT_CACHE", "1")

import jax
import jax.numpy as jnp
import numpy as np

bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
model = sys.argv[2] if len(sys.argv) > 2 else "1b_lyrics"
phase = sys.argv[3] if len(sys.argv) > 3 else "top"

cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
try:
    jax.config.update("jax_platforms", "axon,cpu")
except Exception:
    pass

from jukebox_tpu.hparams import setup_hparams
from jukebox_tpu.models.make_models import MODELS, make_prior, make_vqvae
from jukebox_tpu.models.vqvae import calculate_strides

vqvae_name, *prior_names = MODELS[model]
name = prior_names[-1] if phase == "top" else prior_names[1]
top_hps = setup_hparams(prior_names[-1], dict(sample_length=0))
vq_hps = setup_hparams(vqvae_name, dict(sample_length=0, restore_vqvae=""))
downsamples = calculate_strides(vq_hps.strides_t, vq_hps.downs_t)
raw_per_level = [int(np.prod(downsamples[:l + 1]))
                 for l in range(len(downsamples))]
sample_length = top_hps.n_ctx * raw_per_level[-1]
vq_hps.sample_length = sample_length
vqvae = make_vqvae(vq_hps)

prior = make_prior(setup_hparams(
    name, dict(sample_length=sample_length, restore_prior="",
               fp16_params=True)), vqvae)
prior.stage_decode()
m = prior.model
dec = prior._staged_dec
light = prior._staged_light

SDS = jax.ShapeDtypeStruct

# abstract state from sample_init
if phase == "top":
    n_labels = 4 + 1 + m.n_tokens
    y = SDS((bs, n_labels), jnp.int32)
    z = z_conds = None
else:
    n_cond = m.n_ctx // m.cond_downsample
    z_conds = [SDS((bs, n_cond), jnp.int32)]
    y = SDS((bs, 4 + 1), jnp.int32)
    z = None

abs_light = jax.tree_util.tree_map(
    lambda x: SDS(x.shape, x.dtype), light)
abs_dec = jax.tree_util.tree_map(lambda x: SDS(x.shape, x.dtype), dec)

state = jax.eval_shape(
    lambda p, d, y_, zc: m.sample_init(p, bs, z=z, z_conds=zc, y=y_,
                                       fp16=True, chunk_size=32,
                                       dec_params=d),
    abs_light, abs_dec, y, z_conds)
caches, x_tok, x_cond, y_cond, encoder_kv = state
print("state shapes:")
tot = 0
for nm, v in [("caches", caches), ("x_cond", x_cond), ("y_cond", y_cond),
              ("encoder_kv", encoder_kv)]:
    sz = sum(int(np.prod(l.shape)) * l.dtype.itemsize
             for l in jax.tree_util.tree_leaves(v))
    tot += sz
    print(f"  {nm}: {sz/2**30:.2f} GiB")
dsz = sum(int(np.prod(l.shape)) * l.dtype.itemsize
          for l in jax.tree_util.tree_leaves((dec, light)))
print(f"  staged params: {dsz/2**30:.2f} GiB; state total {tot/2**30:.2f} GiB")

t0 = time.time()
lowered = jax.jit(
    m.sample_segment,
    static_argnames=("n_steps", "fp16", "temp", "top_k", "top_p"),
    donate_argnums=(1,)).lower(
        abs_light, caches, x_tok, np.int32(0), 512, jax.random.key(0),
        x_cond=x_cond, y_cond=y_cond, encoder_kv=encoder_kv,
        fp16=True, temp=0.99, top_k=0, top_p=0.0, dec_params=abs_dec)
print(f"lowered in {time.time()-t0:.1f}s; compiling...")
t0 = time.time()
compiled = lowered.compile()
print(f"compiled in {time.time()-t0:.1f}s")
ma = compiled.memory_analysis()
print(ma)
