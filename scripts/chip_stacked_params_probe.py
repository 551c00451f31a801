"""On-chip A/B: train-step cost of stacking layer params inside the step.

apply() folds layer runs into lax.scan over stacked params, but the stacking
itself (jnp.stack over 48 per-layer trees -> [groups, ...] arrays) runs
INSIDE the jitted train step, and its transpose un-stacks the gradients back
into 48 per-layer slices every step. This probe measures a grad step at the
small_prior transformer shape (1024w x 48L, n_ctx 8192, bs 8, remat on) with

  A) per-layer params (the current train-step layout; stacking in-graph)
  B) segment-stacked params as the step's arguments (stacking done once,
     outside; gradients stay stacked)

Usage: python scripts/chip_stacked_params_probe.py [bs] [n_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jukebox_tpu.models.transformer import Transformer

S, n_ctx, depth, blocks, H = 1024, 8192, 48, 64, 1
BS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

print(f"device: {jax.devices()[0]}")
tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=H, n_depth=depth, attn_order=2,
                 blocks=blocks, m_attn=0.25, m_mlp=1.0, mask=True,
                 checkpoint_res=1)
params = tr.init(jax.random.key(0))
params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
x = jnp.asarray(0.1 * np.random.RandomState(0).randn(BS, n_ctx, S),
                jnp.bfloat16)


def loss_a(params, x):
    y, _ = tr.apply(params, x, fp16=True, fp16_out=True)
    return jnp.sum(y.astype(jnp.float32) ** 2)


def apply_stacked(seg_params, x, unroll=1, split_transpose=False):
    """apply()'s segment loop, but over pre-stacked seg trees."""
    for seg, p_seg in zip(tr.decode_plan, seg_params):
        if seg[0] == "flat":
            cfg = tr.block_cfg(seg[1])

            def block_fn(p, h, _cfg=cfg):
                return _cfg.apply(p, h)[0]
            x = jax.checkpoint(block_fn)(p_seg, x)
        else:
            _, pat, starts = seg

            def body(h, inp, _pat=pat):
                gp, _ = inp
                for j, f in enumerate(_pat):
                    h = tr.block_cfg_f(f).apply(gp[j], h)[0]
                return h, ()
            x, _ = jax.lax.scan(jax.checkpoint(body), x, (p_seg, None),
                                unroll=unroll,
                                _split_transpose=split_transpose)
    return x


def loss_b(seg_params, x):
    y = apply_stacked(seg_params, x)
    return jnp.sum(y.astype(jnp.float32) ** 2)


def bench(name, fn, p):
    g = jax.jit(jax.grad(lambda pp, xx: fn(pp, xx.astype(jnp.bfloat16))))
    t0 = time.time()
    out = g(p, x)
    leaf0 = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf0.ravel()[0]))        # force full execution to host
    print(f"{name}: compile+first {time.time() - t0:.1f}s")
    t0 = time.time()
    chk0 = 0.0
    for _ in range(N_STEPS):
        out = g(p, x)
        # axon async readiness can fake block_until_ready; read a grad
        # element back to host every step so the timing is honest
        chk0 += float(np.asarray(
            jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    dt = (time.time() - t0) / N_STEPS
    leaves = jax.tree_util.tree_leaves(out)
    chk = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))
    print(f"{name}: {1e3 * dt:.1f} ms/step  (grad-sum chk {chk:.3e})")
    return dt


ta = bench("A per-layer (in-step stacking)", loss_a, params)
seg = tr._segment_trees(params["blocks"])
tb = bench("B pre-stacked segments        ", loss_b, seg)
print(f"speedup B vs A: {ta / tb:.3f}x")


def loss_u4(seg_params, x):
    return jnp.sum(apply_stacked(seg_params, x, unroll=4).astype(jnp.float32) ** 2)


def loss_st(seg_params, x):
    return jnp.sum(apply_stacked(seg_params, x,
                                 split_transpose=True).astype(jnp.float32) ** 2)


tu = bench("C stacked + scan unroll=4     ", loss_u4, seg)
ts = bench("D stacked + split_transpose   ", loss_st, seg)
print(f"C vs A {ta / tu:.3f}x, D vs A {ta / ts:.3f}x")
