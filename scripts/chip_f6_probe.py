"""On-chip validation of the megakernel's f6 (encoder cross-attention)
segment support: the 5b order-10 plan shape — scan segments with pattern
(1,2,3,1,2,3,1,2,3,6) — compiled and compared against the XLA decode path.

Width is kept small (the f6 machinery is orthogonal to width; the real 5b
dims are exercised by chip_masked_head_probe + chip_5b_smoke): this probe
answers "does Mosaic compile the q-only piece stream + read-only enc cache".

Usage: python scripts/chip_f6_probe.py [B] [n_tokens]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from jukebox_tpu.models.transformer import Transformer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
n_tok = int(sys.argv[2]) if len(sys.argv) > 2 else 16
quant = bool(int(os.environ.get("PROBE_INT8", "0")))

S, n_ctx, blocks, depth, H, enc_l = 512, 8192, 128, 49, 2, 512
tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=H, n_depth=depth,
                 attn_order=10, blocks=blocks, m_attn=0.25, m_mlp=1.0,
                 mask=True, encoder_dims=enc_l)
pats = [seg[1] for seg in tr.decode_plan if seg[0] == "scan"]
assert any(6 in p for p in pats), tr.decode_plan
print(f"f6 probe: plan={[(s[0], s[1] if s[0] == 'scan' else '') for s in tr.decode_plan]}",
      flush=True)

import contextlib
try:
    _host = jax.default_device(jax.local_devices(backend="cpu")[0])
except RuntimeError:
    _host = contextlib.nullcontext()
with _host:  # eager init on the remote chip costs a round-trip per op
    params = tr.init(jax.random.key(0))
dec = tr.prepare_decode_params(params)
packed = tr.pack_stack_segments(
    jax.tree_util.tree_map(np.asarray, dec), quantize=quant)
packed = jax.tree_util.tree_map(jnp.asarray, packed)
assert tr.has_packed_segments(packed)

rng = np.random.RandomState(1)
enc_kv = jnp.asarray(0.5 * rng.randn(B, enc_l, S), jnp.bfloat16)
c_std = tr.init_cache_from_segments(dec, B, jnp.bfloat16, encoder_kv=enc_kv)
c_pkd = tr.init_cache_from_segments(packed, B, jnp.bfloat16,
                                    encoder_kv=enc_kv)
c_pkd = tr.pack_segment_caches(packed, c_pkd)

ref = jax.jit(lambda c, x, t: tr.decode_step(dec, c, x, t, fp16=True,
                                             fp16_out=True))
mkp = jax.jit(lambda c, x, t: tr.decode_step(packed, c, x, t, fp16=True,
                                             fp16_out=True))

errs, times = [], []
for t in range(n_tok):
    x = jnp.asarray(0.5 * rng.randn(B, 1, S), jnp.bfloat16)
    y_ref, c_std = ref(c_std, x, jnp.asarray(t))
    t0 = time.time()
    y_mk, c_pkd = mkp(c_pkd, x, jnp.asarray(t))
    y_host = np.asarray(y_mk, np.float32)
    times.append(time.time() - t0)
    err = float(np.max(np.abs(np.asarray(y_ref, np.float32) - y_host)))
    mag = float(np.max(np.abs(np.asarray(y_ref, np.float32)))) + 1e-6
    errs.append(err / max(mag, 1.0))
    print(f"t={t}: rel_err={errs[-1]:.4f} kernel {times[-1]*1e3:.1f} ms",
          flush=True)

steady = times[2:] if len(times) > 4 else times[1:]
print(f"\nmax rel err {max(errs):.4f}; kernel path steady "
      f"{1e3 * sum(steady)/len(steady):.2f} ms/token (with host readback)")
assert max(errs) < 0.05, "f6 kernel segments diverge from XLA decode"
print("OK")
