"""On-chip cost breakdown of the 1b top (order-12) decode step.

Measures the XLA transformer decode_step scan at the top prior's shape with
random weights, with and without the flat special layers (f7 prime / f0
dense), to locate the gap between the transformer cost and the ~6-7 ms/step
end-to-end top phase.

Usage: python scripts/chip_top_probe.py [n_tokens]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jukebox_tpu.models.transformer import Transformer

S, n_ctx, blocks, depth, B, H = 2048, 6528, 64, 72, 16, 2
PRIME = 384
N_TOK = int(sys.argv[1]) if len(sys.argv) > 1 else 128

print(f"device: {jax.devices()[0]}")
rng = np.random.RandomState(0)


def bench_stack(order, label, depth=depth):
    tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=H, n_depth=depth,
                     attn_order=order, blocks=blocks, m_attn=0.25, m_mlp=1.0,
                     mask=True, prime_len=PRIME)

    def rnd(*shape, scale=0.02):
        return (scale * rng.randn(*shape)).astype(np.float32)

    A = S // 4
    per_layer = []
    for d in range(depth):
        f = tr.attn_func(d)
        n_state = A
        attn = {"c_attn": {"w": rnd(S, 3 * n_state), "b": rnd(3 * n_state)},
                "c_proj": {"w": rnd(n_state, S), "b": rnd(S)}}
        per_layer.append({
            "attn": attn,
            "mlp": {"c_fc": {"w": rnd(S, S), "b": rnd(S)},
                    "c_proj": {"w": rnd(S, S), "b": rnd(S)}},
            "ln_0": {"g": 1 + rnd(S), "b": rnd(S)},
            "ln_1": {"g": 1 + rnd(S), "b": rnd(S)},
        })
    dec = tr._segment_trees(per_layer, stack=np.stack)
    dec = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16 if a.ndim >= 2 else jnp.float32),
        dec)
    caches = tr.init_cache_from_segments(dec, B, jnp.bfloat16)

    def seg(dp, caches, xs, t0):
        def step(carry, inp):
            c, = carry
            x, t = inp
            y, c = tr.decode_step(dp, c, x, t, fp16=True, fp16_out=True)
            return (c,), y
        (caches,), ys = jax.lax.scan(step, (caches,),
                                     (xs, t0 + jnp.arange(xs.shape[0])))
        return ys, caches

    jit_seg = jax.jit(seg, donate_argnums=(1,))
    xs = jnp.asarray(0.5 * rng.randn(N_TOK, B, 1, S), jnp.bfloat16)
    t0 = time.time()
    ys, caches = jit_seg(dec, caches, xs, jnp.int32(0))
    chk = float(np.asarray(ys[-1, 0, 0, :4], np.float32).sum())
    warm = time.time() - t0
    for rep in range(2):
        t0 = time.time()
        ys, caches = jit_seg(dec, caches, xs, jnp.int32(N_TOK * (rep + 1)))
        # copy a slice of EVERY step's output to host so async readiness
        # cannot fake the timing
        chk = float(np.asarray(ys[:, 0, 0, 0], np.float32).sum())
        dt = time.time() - t0
        print(f"{label}: warm {warm:.1f}s, rep{rep} "
              f"{1e3 * dt / N_TOK:.2f} ms/step "
              f"({N_TOK * B / dt:.0f} tok/s) chk={chk:.3f}")
    del caches, dec
    return dt


bench_stack(12, "order-12 full (4 scans + f7/f7/f0/f7 + tail)")
bench_stack(2, "order-2 same shape (all [1,2,3] scans)   ")
