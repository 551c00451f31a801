"""On-chip probe: whole-stack decode megakernel vs the XLA decode path.

Builds a random-weight order-2 upsampler-shaped stack (1920w x 72L, bs 16 —
the 1b/5b upsampler decode shape that dominates the sampling cascade),
wraps one token step of each path in the same lax.scan segment graph the
sampler uses, and times steady-state tokens/sec. Cross-checks 16 tokens of
megakernel output against the XLA path spanning a block boundary (t=56..72
crosses bc=64: f1 slot wrap, f2 column change, f3 ring flip). The two paths
run sequentially — their caches (~6 GB each at bs=16) don't both fit HBM.

Usage: python scripts/chip_stack_decode.py [n_tokens]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)

import jax.numpy as jnp

from jukebox_tpu.models.transformer import Transformer
from jukebox_tpu.ops.pallas.decode_stack import (_flatten_packed,
                                                 build_stack_decode,
                                                 init_kernel_caches,
                                                 pack_decode_params)

S, A, n_ctx, blocks, depth, B = 1920, 480, 8192, 128, 72, 16
N_TOK = int(sys.argv[1]) if len(sys.argv) > 1 else 256
bc = n_ctx // blocks
G = depth // 3
T0_CHECK = 56  # correctness window crosses the bc=64 block boundary

print(f"device: {jax.devices()[0]}")
rng = np.random.RandomState(0)


def rnd(*shape, scale=0.02):
    return (scale * rng.randn(*shape)).astype(np.float32)


def layer_tree():
    return {
        "attn": {"c_attn": {"w": rnd(S, 3 * A), "b": rnd(3 * A)},
                 "c_proj": {"w": rnd(A, S), "b": rnd(S)}},
        "mlp": {"c_fc": {"w": rnd(S, S), "b": rnd(S)},
                "c_proj": {"w": rnd(S, S), "b": rnd(S)}},
        "ln_0": {"g": 1 + rnd(S), "b": rnd(S)},
        "ln_1": {"g": 1 + rnd(S), "b": rnd(S)},
    }


print("building random stacked params...")
per_layer = [layer_tree() for _ in range(depth)]
tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=1, n_depth=depth, attn_order=2,
                 blocks=blocks, m_attn=0.25, m_mlp=1.0, mask=True)
plan = tr.decode_plan
assert len(plan) == 1 and plan[0][0] == "scan", plan
p_seg_host = tr._segment_trees(per_layer, stack=np.stack)[0]
INT8 = os.environ.get("PROBE_INT8", "0") == "1"
INT8_CACHE = os.environ.get("PROBE_INT8_CACHE", "0") == "1"
packed_host = pack_decode_params(p_seg_host, quantize=INT8)
if INT8:
    print("megakernel path: int8 weight streaming")
if INT8_CACHE:
    print("megakernel path: int8 ring caches")

xs_np = (0.5 * rng.randn(max(N_TOK, 16), B, 1, S)).astype(np.float32)
mk = build_stack_decode(S, A, S, bc, blocks, G, B, quantized=INT8,
                        cache_quantized=INT8_CACHE)


def seg_mk(packed_w, c6, xs, t0):
    def step(carry, inp):
        c6, = carry
        x, t = inp
        y, c6 = mk(packed_w, c6, x, t)
        return (c6,), y
    (c6,), ys = jax.lax.scan(step, (c6,),
                             (xs, t0 + jnp.arange(xs.shape[0])))
    return ys, c6


def seg_xla(dp, caches, xs, t0):
    def step(carry, inp):
        caches, = carry
        x, t = inp
        y, caches = tr.decode_step([dp], caches, x, t, fp16=True,
                                   fp16_out=True)
        return (caches,), y
    (caches,), ys = jax.lax.scan(step, (caches,),
                                 (xs, t0 + jnp.arange(xs.shape[0])))
    return ys, caches


def steady_time(jit_fn, w, make_caches, label):
    xs = jnp.asarray(xs_np[:N_TOK], jnp.bfloat16)
    t0 = time.time()
    ys, c_out = jit_fn(w, make_caches(), xs, jnp.int32(0))
    # full host readback: axon async readiness can fake block_until_ready
    float(np.asarray(ys[:, 0, 0, 0], np.float32).sum())
    warm = time.time() - t0
    t0 = time.time()
    ys, c_out = jit_fn(w, c_out, xs, jnp.int32(N_TOK))
    float(np.asarray(ys[:, 0, 0, 0], np.float32).sum())
    dt = time.time() - t0
    del c_out
    print(f"{label}: warm {warm:.1f}s, steady {dt:.2f}s / {N_TOK} steps "
          f"-> {1e3 * dt / N_TOK:.2f} ms/step, {N_TOK * B / dt:.0f} tok/s")
    return dt


xs_chk = jnp.asarray(xs_np[:16], jnp.bfloat16)

# ---- XLA path first --------------------------------------------------------
p_seg_dev = jax.tree_util.tree_map(
    lambda a: jnp.asarray(a, jnp.bfloat16 if a.ndim >= 2 else jnp.float32),
    p_seg_host)
jit_xla = jax.jit(seg_xla, donate_argnums=(1,))


def xla_caches():
    return tr.init_cache_from_segments([p_seg_dev], B, jnp.bfloat16)


print("xla path: correctness tokens...")
t0 = time.time()
ys_ref, c_out = jit_xla(p_seg_dev, xla_caches(), xs_chk, jnp.int32(T0_CHECK))
ys_ref = np.asarray(ys_ref, np.float32)
del c_out
print(f"  compile+run {time.time() - t0:.1f}s")
dt_xla = steady_time(jit_xla, p_seg_dev, xla_caches, "xla path  ")
del p_seg_dev

# ---- megakernel ------------------------------------------------------------
packed = [jnp.asarray(a) for a in _flatten_packed(packed_host)]
jit_mk = jax.jit(seg_mk, donate_argnums=(1,))


def mk_caches():
    return init_kernel_caches(G, bc, blocks, B, A, quantize=INT8_CACHE)


print("megakernel: correctness tokens...")
t0 = time.time()
ys_mk, c6 = jit_mk(packed, mk_caches(), xs_chk, jnp.int32(T0_CHECK))
ys_mk = np.asarray(ys_mk, np.float32)
del c6
print(f"  compile+run {time.time() - t0:.1f}s")
err = np.max(np.abs(ys_mk - ys_ref))
mag = np.max(np.abs(ys_ref))
print(f"  vs xla: max_err {err:.5f} (mag {mag:.2f})")
assert err < 0.1 * max(mag, 1.0), "megakernel diverges from XLA path"
dt_mk = steady_time(jit_mk, packed, mk_caches, "megakernel")
print(f"speedup: {dt_xla / dt_mk:.2f}x")
