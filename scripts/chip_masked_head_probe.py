"""On-chip validation of the megakernel's masked-head path at 5b-top-like
shapes (S=4800, A=1200, heads=8 -> hd=150, NOT lane-aligned): compile,
parity vs the XLA decode step, and per-token timing.

Usage: python scripts/chip_masked_head_probe.py [G] [B] [n_tokens]
(G = groups per scan segment; the real 5b top is G=24 over pattern (1,2,3).)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize pins the axon backend regardless of the env var
    jax.config.update("jax_platforms", "cpu")
else:
    try:
        jax.config.update("jax_platforms", "axon,cpu")
    except Exception:
        pass

from jukebox_tpu.models.transformer import Transformer
from jukebox_tpu.ops.pallas.decode_stack import (_flatten_packed,
                                                 build_stack_decode,
                                                 pack_caches,
                                                 pack_decode_params)

G = int(sys.argv[1]) if len(sys.argv) > 1 else 4
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
n_tok = int(sys.argv[3]) if len(sys.argv) > 3 else 16

# 5b top dims: width 4800, m_attn 0.25 -> A=1200, heads 8 (hd=150),
# n_ctx 8192, blocks 128 -> bc 64 (hparams prior_5b/_lyrics).
# PROBE_S/PROBE_CTX shrink for CPU smoke runs.
S = int(os.environ.get("PROBE_S", "4800"))
n_ctx = int(os.environ.get("PROBE_CTX", "8192"))
blocks, H = 128, int(os.environ.get("PROBE_H", "8"))
depth = 3 * G
bc = n_ctx // blocks
interpret = jax.devices()[0].platform == "cpu"

print(f"masked-head probe: S={S} A={S//4} H={H} hd={S//4//H} G={G} B={B}",
      flush=True)
tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=H, n_depth=depth, attn_order=2,
                 blocks=blocks, m_attn=0.25, m_mlp=1.0, mask=True)
import contextlib
try:
    _host = jax.default_device(jax.local_devices(backend="cpu")[0])
except RuntimeError:
    _host = contextlib.nullcontext()
with _host:  # eager init on the remote chip costs a round-trip per op
    params = tr.init(jax.random.key(0))
dec = tr.prepare_decode_params(params)
caches = tr.init_cache_from_segments(dec, B, jnp.bfloat16)
assert len(tr.decode_plan) == 1 and tr.decode_plan[0][0] == "scan"

quant = bool(int(os.environ.get("PROBE_INT8", "0")))
packed = _flatten_packed(pack_decode_params(
    jax.tree_util.tree_map(np.asarray, dec[0]), quantize=quant))
packed = [jnp.asarray(p) for p in packed]
head_mode = os.environ.get("PROBE_HEAD_MODE", "auto")
mk = jax.jit(build_stack_decode(S, int(0.25 * S), int(1.0 * S), bc, blocks,
                                G, B, n_head=H, quantized=quant,
                                interpret=interpret, head_mode=head_mode))
ref = jax.jit(lambda dp, c, x, t: tr.decode_step(dp, c, x, t, fp16=True,
                                                 fp16_out=True))

c6 = pack_caches(caches[0], bc)
rng = np.random.RandomState(0)
errs, times = [], []
for t in range(n_tok):
    x = jnp.asarray(0.5 * rng.randn(B, 1, S), jnp.bfloat16)
    y_ref, caches = ref(dec, caches, x, jnp.asarray(t))
    t0 = time.time()
    y_mk, c6 = mk(packed, c6, x, jnp.asarray(t))
    y_host = np.asarray(y_mk, np.float32)  # force readback (axon timing)
    times.append(time.time() - t0)
    err = float(np.max(np.abs(np.asarray(y_ref, np.float32) - y_host)))
    mag = float(np.max(np.abs(np.asarray(y_ref, np.float32)))) + 1e-6
    errs.append(err / max(mag, 1.0))
    print(f"t={t}: rel_err={errs[-1]:.4f} kernel {times[-1]*1e3:.1f} ms",
          flush=True)

steady = times[2:] if len(times) > 4 else times[1:]
print(f"\nmax rel err {max(errs):.4f}; kernel steady "
      f"{1e3 * sum(steady)/len(steady):.2f} ms/token "
      f"(incl. per-token host readback)")
assert max(errs) < 0.05, "masked-head kernel diverges from XLA decode"

# scanned-segment rate: one readback per SEG tokens, so the tunnel
# round-trip does not swamp the kernel time
SEG = int(os.environ.get("PROBE_SEG", "64"))
if SEG and not interpret:
    def seg_fn(packed, c6, xs, t0):
        def step(carry, inp):
            c, = carry
            x, tt = inp
            y, c = mk(packed, c, x, tt)
            return (c,), y[:, 0, 0]
        (c6,), ys = jax.lax.scan(step, (c6,),
                                 (xs, t0 + jnp.arange(SEG)))
        return ys, c6
    jseg = jax.jit(seg_fn, donate_argnums=(1,))
    xs = jnp.asarray(0.5 * rng.randn(SEG, B, 1, S), jnp.bfloat16)
    t0c = time.time()
    ys, c6 = jseg(packed, c6, xs, jnp.int32(n_tok))
    float(np.asarray(ys, np.float32).sum())
    print(f"segment compile+first {time.time() - t0c:.1f}s")
    for rep in range(2):
        t0c = time.time()
        ys, c6 = jseg(packed, c6, xs, jnp.int32(n_tok + SEG * (rep + 1)))
        float(np.asarray(ys, np.float32).sum())   # full readback
        dt = time.time() - t0c
        print(f"scan rep{rep}: {1e3 * dt / SEG:.2f} ms/token "
              f"({SEG * B / dt:.0f} tok/s)")
print("OK")
