"""Whole-stack decode megakernel (ops/pallas/decode_stack.py) equivalence
vs the reference XLA decode path, in Pallas interpret mode on CPU.

The megakernel must reproduce Transformer.decode_step for an order-2
([1,2,3]-cycle) stack token by token — outputs and ring caches — across
block boundaries (the f2 column write, the f3 ring flip), group boundaries
(the weight-piece pipeline crossing groups), and lane padding (lane=32 pads
the A=16 attention width the way lane=128 pads the 480-wide upsamplers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jukebox_tpu.models.transformer import Transformer
from jukebox_tpu.ops.pallas.decode_stack import (_flatten_packed,
                                                 build_stack_decode,
                                                 pack_caches,
                                                 pack_decode_params,
                                                 unpack_caches)


@pytest.mark.parametrize("lane,res_scale", [(8, False), (32, True)])
def test_stack_decode_matches_xla_path(lane, res_scale):
    S, A, n_ctx, blocks, depth, B = 64, 16, 16, 4, 6, 2
    bc = n_ctx // blocks
    G = depth // 3
    tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=1, n_depth=depth,
                     attn_order=2, blocks=blocks, m_attn=0.25, m_mlp=1.0,
                     mask=True, res_scale=res_scale)
    params = tr.init(jax.random.key(0))
    dec_params = tr.prepare_decode_params(params)
    caches = tr.init_cache_from_segments(dec_params, B, jnp.bfloat16)
    assert len(tr.decode_plan) == 1 and tr.decode_plan[0][0] == "scan"

    p_seg, c_seg = dec_params[0], caches[0]
    packed = _flatten_packed(pack_decode_params(p_seg, lane=lane))
    mk = jax.jit(build_stack_decode(
        S, A, S, bc, blocks, G, B, lane=lane,
        res_scale=(1.0 / depth) if res_scale else 1.0, interpret=True))
    ref = jax.jit(lambda dp, c, x, t: tr.decode_step(dp, c, x, t, fp16=True,
                                                     fp16_out=True))

    c6 = pack_caches(c_seg, bc, lane=lane)
    rng = np.random.RandomState(0)
    xs = (0.5 * rng.randn(n_ctx, B, 1, S)).astype(np.float32)

    for t in range(n_ctx):
        x = jnp.asarray(xs[t], jnp.bfloat16)
        y_ref, caches = ref(dec_params, caches, x, jnp.asarray(t))
        y_mk, c6 = mk(packed, c6, x, jnp.asarray(t))
        err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                    - y_mk.astype(jnp.float32))))
        mag = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-6
        assert err < 0.03 * max(mag, 1.0), (t, err, mag)

    c_std = unpack_caches(c6, A, B=B)
    for cr, cm in zip(caches[0], c_std):
        for key in ("k", "v"):
            e = float(jnp.max(jnp.abs(cr[key].astype(jnp.float32)
                                      - cm[key].astype(jnp.float32))))
            assert e < 0.02, (key, e)


@pytest.mark.parametrize("head_mode,n_head", [
    ("masked", 2),   # non-lane-aligned hd (the 5b top's hd=150 case)
    ("masked", 3),   # hd that doesn't divide the lane at all
    ("sliced", 2),   # the 1b top's lane-aligned-hd formulation
    ("matmul", 2),   # head-membership-matmul path (5b top default)
    ("matmul", 3),
])
def test_stack_decode_multi_head_modes(head_mode, n_head):
    """Both head decompositions — lane-aligned slices and full-width masked
    heads — must reproduce the XLA decode path. The masked path is what
    qualifies the 5b top (hd=150) for the megakernel."""
    S, n_ctx, blocks, depth, B, lane = 96, 16, 4, 6, 2, 8
    A = 24  # m_attn 0.25; hd = 12 or 8 — never lane-aligned
    assert A % n_head == 0
    bc = n_ctx // blocks
    G = depth // 3
    tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=n_head, n_depth=depth,
                     attn_order=2, blocks=blocks, m_attn=0.25, m_mlp=1.0,
                     mask=True)
    params = tr.init(jax.random.key(3))
    dec_params = tr.prepare_decode_params(params)
    caches = tr.init_cache_from_segments(dec_params, B, jnp.bfloat16)

    p_seg, c_seg = dec_params[0], caches[0]
    packed = _flatten_packed(pack_decode_params(p_seg, lane=lane))
    mk = jax.jit(build_stack_decode(
        S, A, S, bc, blocks, G, B, lane=lane, n_head=n_head,
        interpret=True, head_mode=head_mode))
    ref = jax.jit(lambda dp, c, x, t: tr.decode_step(dp, c, x, t, fp16=True,
                                                     fp16_out=True))

    c6 = pack_caches(c_seg, bc, lane=lane)
    rng = np.random.RandomState(4)
    for t in range(n_ctx):
        x = jnp.asarray(0.5 * rng.randn(B, 1, S), jnp.bfloat16)
        y_ref, caches = ref(dec_params, caches, x, jnp.asarray(t))
        y_mk, c6 = mk(packed, c6, x, jnp.asarray(t))
        err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                    - y_mk.astype(jnp.float32))))
        mag = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-6
        assert err < 0.03 * max(mag, 1.0), (t, err, mag)


def test_stack_decode_non_lane_divisible_width():
    """Widths with no lane-aligned piece divisor (the 5b top's S=4800 has
    none for lane=128) pad to the lane tile: zero weight rows/cols + zero
    LN gains keep the padded activation columns exactly 0, and the
    LayerNorm statistics are masked to the real width. lane=32 vs S=48
    reproduces the arithmetic at test scale."""
    S, A, n_ctx, blocks, depth, B, lane = 48, 12, 16, 4, 6, 2, 32
    bc = n_ctx // blocks
    G = depth // 3
    tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=1, n_depth=depth,
                     attn_order=2, blocks=blocks, m_attn=0.25, m_mlp=1.0,
                     mask=True)
    params = tr.init(jax.random.key(5))
    dec_params = tr.prepare_decode_params(params)
    caches = tr.init_cache_from_segments(dec_params, B, jnp.bfloat16)

    packed = _flatten_packed(pack_decode_params(dec_params[0], lane=lane))
    assert packed[0].shape[-2] == 64  # Sp = round_up(48, 32)... rows padded
    mk = jax.jit(build_stack_decode(S, A, S, bc, blocks, G, B, lane=lane,
                                    interpret=True))
    ref = jax.jit(lambda dp, c, x, t: tr.decode_step(dp, c, x, t, fp16=True,
                                                     fp16_out=True))

    c6 = pack_caches(caches[0], bc, lane=lane)
    rng = np.random.RandomState(6)
    for t in range(n_ctx):
        x = jnp.asarray(0.5 * rng.randn(B, 1, S), jnp.bfloat16)
        y_ref, caches = ref(dec_params, caches, x, jnp.asarray(t))
        y_mk, c6 = mk(packed, c6, x, jnp.asarray(t))
        err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                    - y_mk.astype(jnp.float32))))
        mag = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-6
        assert err < 0.03 * max(mag, 1.0), (t, err, mag)


def test_stack_decode_int8_caches():
    """int8 ring caches (cache_quantized=True): per-(slot, batch) absmax
    rows with scales folded into the [B, L] score/weight matrices. Must
    track the bf16 XLA path within quantization noise and round-trip
    through pack/unpack_caches."""
    S, A, n_ctx, blocks, depth, B, lane = 64, 16, 16, 4, 6, 2, 32
    bc = n_ctx // blocks
    G = depth // 3
    tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=1, n_depth=depth,
                     attn_order=2, blocks=blocks, m_attn=0.25, m_mlp=1.0,
                     mask=True)
    params = tr.init(jax.random.key(0))
    dec_params = tr.prepare_decode_params(params)
    caches = tr.init_cache_from_segments(dec_params, B, jnp.bfloat16)

    p_seg, c_seg = dec_params[0], caches[0]
    packed = _flatten_packed(pack_decode_params(p_seg, lane=lane))
    mk = jax.jit(build_stack_decode(S, A, S, bc, blocks, G, B, lane=lane,
                                    interpret=True, cache_quantized=True))
    ref = jax.jit(lambda dp, c, x, t: tr.decode_step(dp, c, x, t, fp16=True,
                                                     fp16_out=True))

    c6 = pack_caches(c_seg, bc, lane=lane, quantize=True)
    assert len(c6) == 12 and c6[0].dtype == jnp.int8
    assert c6[2].dtype == jnp.bfloat16  # scale rows
    rng = np.random.RandomState(0)
    for t in range(n_ctx):
        x = jnp.asarray(0.5 * rng.randn(B, 1, S), jnp.bfloat16)
        y_ref, caches = ref(dec_params, caches, x, jnp.asarray(t))
        y_mk, c6 = mk(packed, c6, x, jnp.asarray(t))
        err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                    - y_mk.astype(jnp.float32))))
        mag = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-6
        assert err < 0.05 * max(mag, 1.0), (t, err, mag)

    c_std = unpack_caches(c6, A, B=B)  # auto-detects the 4-per-position form
    for cr, cm in zip(caches[0], c_std):
        for key in ("k", "v"):
            a = cr[key].astype(jnp.float32)
            b = cm[key].astype(jnp.float32)
            e = float(jnp.max(jnp.abs(a - b)))
            m = float(jnp.max(jnp.abs(a))) + 1e-6
            assert e < 0.02 * max(m, 1.0), (key, e, m)


def test_stack_decode_int8_caches_matmul_heads():
    """int8 caches under the head-membership-matmul formulation (the 5b
    top's hd=150 path): scale folds ride the [L, B, H] score tensor."""
    S, n_ctx, blocks, depth, B, lane = 96, 16, 4, 6, 2, 8
    A = 24
    bc = n_ctx // blocks
    G = depth // 3
    tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=2, n_depth=depth,
                     attn_order=2, blocks=blocks, m_attn=0.25, m_mlp=1.0,
                     mask=True)
    params = tr.init(jax.random.key(3))
    dec_params = tr.prepare_decode_params(params)
    caches = tr.init_cache_from_segments(dec_params, B, jnp.bfloat16)

    packed = _flatten_packed(pack_decode_params(dec_params[0], lane=lane))
    mk = jax.jit(build_stack_decode(S, A, S, bc, blocks, G, B, lane=lane,
                                    n_head=2, interpret=True,
                                    head_mode="matmul", cache_quantized=True))
    ref = jax.jit(lambda dp, c, x, t: tr.decode_step(dp, c, x, t, fp16=True,
                                                     fp16_out=True))
    c6 = pack_caches(caches[0], bc, lane=lane, quantize=True)
    rng = np.random.RandomState(4)
    for t in range(n_ctx):
        x = jnp.asarray(0.5 * rng.randn(B, 1, S), jnp.bfloat16)
        y_ref, caches = ref(dec_params, caches, x, jnp.asarray(t))
        y_mk, c6 = mk(packed, c6, x, jnp.asarray(t))
        err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                    - y_mk.astype(jnp.float32))))
        mag = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-6
        assert err < 0.05 * max(mag, 1.0), (t, err, mag)
