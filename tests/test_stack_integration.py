"""Integration of the whole-stack decode megakernel into the staged decode
path: packed-weight staging (pack_stack_segments), prefill over packed
params (per-group reconstruction), the prefill -> decode cache-layout
conversion (pack_segment_caches), and the decode_step dispatch — all vs the
standard XLA segment path, interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jukebox_tpu.models.transformer import Transformer


def _setup(quantize=False, order=2):
    if order == 12:
        # depth 22 yields flat f7 at 15, a rotated (2,3,1) scan at 16..21,
        # plus the plain (1,2,3) scans — exercises rotations, heads=2 and
        # single-layer packed flats (since the f7/f0 kernel patterns landed,
        # every flat special packs; mixed megakernel/XLA decode is covered
        # by test_packed_decode_with_f6_segments' standard-flat layers)
        S, n_ctx, blocks, depth, B = 64, 32, 4, 22, 2
        tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=2, n_depth=depth,
                         attn_order=12, blocks=blocks, m_attn=0.25,
                         m_mlp=1.0, mask=True, prime_len=8)
    else:
        S, n_ctx, blocks, depth, B = 64, 16, 4, 6, 2
        tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=1, n_depth=depth,
                         attn_order=2, blocks=blocks, m_attn=0.25, m_mlp=1.0,
                         mask=True)
    params = tr.init(jax.random.key(0))
    dec = tr.prepare_decode_params(params)
    if quantize:
        # reference: the XLA weight-only-int8 segment path
        from jukebox_tpu.ops.core import quantize_dense_tree
        dec = jax.tree_util.tree_map(np.asarray, dec)
        dec = quantize_dense_tree(dec)
        dec = jax.tree_util.tree_map(jnp.asarray, dec)
        packed = tr.pack_stack_segments(tr.prepare_decode_params(params),
                                        quantize=True)
    else:
        packed = tr.pack_stack_segments(dec)
    assert tr.has_packed_segments(packed)
    assert not tr.has_packed_segments(dec)
    return tr, dec, packed, (S, n_ctx, blocks, B)


@pytest.mark.parametrize("quantize", [False, True])
def test_packed_prefill_matches_standard(quantize):
    tr, dec, packed, (S, n_ctx, blocks, B) = _setup(quantize)
    rng = np.random.RandomState(0)
    x_chunk = jnp.asarray(0.5 * rng.randn(B, 8, S), jnp.bfloat16)  # 2 blocks

    c_std = tr.init_cache_from_segments(dec, B, jnp.bfloat16)
    c_pkd = tr.init_cache_from_segments(packed, B, jnp.bfloat16)
    # packed + bf16 initialises kernel-layout caches and prefills them
    # in place (kernel_cache path) — compare through unpack_caches
    from jukebox_tpu.ops.pallas.decode_stack import unpack_caches
    assert not isinstance(c_pkd[0][0], dict)
    y_std, c_std = tr.prefill_chunk(dec, c_std, x_chunk, jnp.int32(0), 2,
                                    fp16=True, fp16_out=True)
    y_pkd, c_pkd = tr.prefill_chunk(packed, c_pkd, x_chunk, jnp.int32(0), 2,
                                    fp16=True, fp16_out=True)
    err = float(jnp.max(jnp.abs(y_std.astype(jnp.float32)
                                - y_pkd.astype(jnp.float32))))
    assert err < 0.02, err
    c_pkd_std = [unpack_caches(cs, S // 4, pat=tuple(seg[1]), B=B)
                 for seg, cs in zip(tr.decode_plan, c_pkd)]
    for a, b in zip(jax.tree_util.tree_leaves(c_std),
                    jax.tree_util.tree_leaves(c_pkd_std)):
        e = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        assert e < 0.02, e


@pytest.mark.parametrize("quantize,order",
                         [(False, 2), (True, 2), (False, 12)])
def test_packed_decode_after_conversion_matches_standard(quantize, order):
    tr, dec, packed, (S, n_ctx, blocks, B) = _setup(quantize, order)
    rng = np.random.RandomState(1)
    x_chunk = jnp.asarray(0.5 * rng.randn(B, 8, S), jnp.bfloat16)

    nb = 8 // (n_ctx // blocks)
    c_std = tr.init_cache_from_segments(dec, B, jnp.bfloat16)
    c_pkd = tr.init_cache_from_segments(packed, B, jnp.bfloat16)
    _, c_std = tr.prefill_chunk(dec, c_std, x_chunk, jnp.int32(0), nb,
                                fp16=True)
    _, c_pkd = tr.prefill_chunk(packed, c_pkd, x_chunk, jnp.int32(0), nb,
                                fp16=True)
    # prefill -> decode boundary: convert to the kernel cache layout.
    # int8 weight staging defaults to int8 ring caches too (4 arrays per
    # pattern position: k, v int8 + bf16 scale rows)
    c_pkd = tr.pack_segment_caches(packed, c_pkd)
    assert isinstance(c_pkd[0], tuple)
    assert len(c_pkd[0]) == (12 if quantize else 6)
    if quantize:
        assert c_pkd[0][0].dtype == jnp.int8
        assert c_pkd[0][2].dtype == jnp.bfloat16
    # idempotent on already-converted caches
    assert tr.pack_segment_caches(packed, c_pkd)[0] is c_pkd[0]

    ref = jax.jit(lambda c, x, t: tr.decode_step(dec, c, x, t, fp16=True,
                                                 fp16_out=True))
    mkp = jax.jit(lambda c, x, t: tr.decode_step(packed, c, x, t, fp16=True,
                                                 fp16_out=True))
    tol = 0.05 if quantize else 0.03  # int8 rows add ~0.5% quant noise
    for t in range(8, n_ctx):
        x = jnp.asarray(0.5 * rng.randn(B, 1, S), jnp.bfloat16)
        y_std, c_std = ref(c_std, x, jnp.asarray(t))
        y_pkd, c_pkd = mkp(c_pkd, x, jnp.asarray(t))
        err = float(jnp.max(jnp.abs(y_std.astype(jnp.float32)
                                    - y_pkd.astype(jnp.float32))))
        mag = float(jnp.max(jnp.abs(y_std.astype(jnp.float32)))) + 1e-6
        assert err < tol * max(mag, 1.0), (t, err, mag)


@pytest.mark.parametrize("quantize", [False, True])
def test_packed_decode_with_f6_segments(quantize):
    """5b order-10 plan shape: a (1,2,3,1,2,3,1,2,3,6) scan segment — the
    f6 cross-attention layers ride the megakernel with a read-only
    projected-encoder cache and a q-only weight stream. Token-by-token
    equivalence vs the XLA segment path, interpret mode."""
    S, n_ctx, blocks, depth, B, enc_l = 64, 16, 4, 49, 2, 16
    tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=2, n_depth=depth,
                     attn_order=10, blocks=blocks, m_attn=0.25, m_mlp=1.0,
                     mask=True, encoder_dims=enc_l)
    pats = [seg[1] for seg in tr.decode_plan if seg[0] == "scan"]
    assert any(6 in p for p in pats), tr.decode_plan

    params = tr.init(jax.random.key(1))
    dec = tr.prepare_decode_params(params)
    if quantize:
        from jukebox_tpu.ops.core import quantize_dense_tree
        dec_q = jax.tree_util.tree_map(np.asarray, dec)
        dec_q = quantize_dense_tree(dec_q)
        dec_std = jax.tree_util.tree_map(jnp.asarray, dec_q)
        packed = tr.pack_stack_segments(tr.prepare_decode_params(params),
                                        quantize=True)
    else:
        dec_std = dec
        packed = tr.pack_stack_segments(dec)
    assert tr.has_packed_segments(packed)
    assert any(isinstance(p, dict) and "enc_proj" in p for p in packed)

    rng = np.random.RandomState(2)
    enc_kv = jnp.asarray(0.5 * rng.randn(B, enc_l, S), jnp.bfloat16)
    c_std = tr.init_cache_from_segments(dec_std, B, jnp.bfloat16,
                                        encoder_kv=enc_kv)
    c_pkd = tr.init_cache_from_segments(packed, B, jnp.bfloat16,
                                        encoder_kv=enc_kv)

    # prefill one chunk through both, then convert to the kernel layout
    x_chunk = jnp.asarray(0.5 * rng.randn(B, 8, S), jnp.bfloat16)
    nb = 8 // (n_ctx // blocks)
    _, c_std = tr.prefill_chunk(dec_std, c_std, x_chunk, jnp.int32(0), nb,
                                fp16=True)
    _, c_pkd = tr.prefill_chunk(packed, c_pkd, x_chunk, jnp.int32(0), nb,
                                fp16=True)
    c_pkd = tr.pack_segment_caches(packed, c_pkd)

    ref = jax.jit(lambda c, x, t: tr.decode_step(dec_std, c, x, t, fp16=True,
                                                 fp16_out=True))
    mkp = jax.jit(lambda c, x, t: tr.decode_step(packed, c, x, t, fp16=True,
                                                 fp16_out=True))
    for t in range(8, n_ctx):
        x = jnp.asarray(0.5 * rng.randn(B, 1, S), jnp.bfloat16)
        y_std, c_std = ref(c_std, x, jnp.asarray(t))
        y_pkd, c_pkd = mkp(c_pkd, x, jnp.asarray(t))
        err = float(jnp.max(jnp.abs(y_std.astype(jnp.float32)
                                    - y_pkd.astype(jnp.float32))))
        mag = float(jnp.max(jnp.abs(y_std.astype(jnp.float32)))) + 1e-6
        assert err < 0.04 * max(mag, 1.0), (t, err, mag)


def test_packed_flat_specials_full_order12_stack():
    """Order 12 at depth 50 hits ALL the specials: flat f7 (d=15, 31),
    flat f0 dense (d=47) and stray f1/f2 tail singles (d=48, 49) — with
    flat packing every one of the 50 layers decodes through the megakernel
    (pat=(f,) single-layer segments for the flats). Token-by-token
    equivalence vs the XLA path, across the prime boundary (t < _prime_len
    still writes the prime cache) and multiple f0 read chunks."""
    from jukebox_tpu.ops.pallas import decode_stack

    S, n_ctx, blocks, depth, B = 64, 64, 4, 50, 2
    old_cap = decode_stack.F0_CHUNK_CAP
    decode_stack.F0_CHUNK_CAP = 16  # 4 read chunks over the 64-slot ring
    try:
        tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=2, n_depth=depth,
                         attn_order=12, blocks=blocks, m_attn=0.25,
                         m_mlp=1.0, mask=True, prime_len=20)
        funcs = [tr.attn_func(d) for d in range(depth)]
        assert funcs[15] == 7 and funcs[47] == 0
        params = tr.init(jax.random.key(3))
        dec = tr.prepare_decode_params(params)
        packed = tr.pack_stack_segments(dec)
        # every segment packed: no standard trees left
        assert all(isinstance(p, dict) and "stack_packed" in p
                   for p in packed), [type(p) for p in packed]

        rng = np.random.RandomState(4)
        c_std = tr.init_cache_from_segments(dec, B, jnp.bfloat16)
        c_pkd = tr.init_cache_from_segments(packed, B, jnp.bfloat16)
        # prefill one full block (f1/f2/f3 need block-aligned chunks);
        # prime_len 20 -> _prime_len 24, so decode from t=16 crosses the
        # prime boundary at t=24 (t < 24 still writes the f7 prime cache)
        bc = n_ctx // blocks
        x_chunk = jnp.asarray(0.5 * rng.randn(B, bc, S), jnp.bfloat16)
        _, c_std = tr.prefill_chunk(dec, c_std, x_chunk, jnp.int32(0), 1,
                                    fp16=True)
        _, c_pkd = tr.prefill_chunk(packed, c_pkd, x_chunk, jnp.int32(0), 1,
                                    fp16=True)
        c_pkd = tr.pack_segment_caches(packed, c_pkd)

        ref = jax.jit(lambda c, x, t: tr.decode_step(dec, c, x, t,
                                                     fp16=True,
                                                     fp16_out=True))
        mkp = jax.jit(lambda c, x, t: tr.decode_step(packed, c, x, t,
                                                     fp16=True,
                                                     fp16_out=True))
        for t in range(bc, n_ctx):
            x = jnp.asarray(0.5 * rng.randn(B, 1, S), jnp.bfloat16)
            y_std, c_std = ref(c_std, x, jnp.asarray(t))
            y_pkd, c_pkd = mkp(c_pkd, x, jnp.asarray(t))
            err = float(jnp.max(jnp.abs(y_std.astype(jnp.float32)
                                        - y_pkd.astype(jnp.float32))))
            mag = float(jnp.max(jnp.abs(y_std.astype(jnp.float32)))) + 1e-6
            assert err < 0.04 * max(mag, 1.0), (t, err, mag)
    finally:
        decode_stack.F0_CHUNK_CAP = old_cap


def test_packed_scan_with_f0_order9():
    """Order-9 ([1,2,3,0] cycle) scan segments carry the f0 dense ring
    INSIDE the scanned pattern (G > 1) — the chunked online-softmax read
    must match the XLA path for every group."""
    S, n_ctx, blocks, depth, B = 64, 16, 4, 8, 2
    tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=1, n_depth=depth,
                     attn_order=9, blocks=blocks, m_attn=0.25, m_mlp=1.0,
                     mask=True)
    assert tr.decode_plan == (("scan", (1, 2, 3, 0), (0, 4)),)
    params = tr.init(jax.random.key(5))
    dec = tr.prepare_decode_params(params)
    packed = tr.pack_stack_segments(dec)
    assert tr.has_packed_segments(packed)

    rng = np.random.RandomState(6)
    c_std = tr.init_cache_from_segments(dec, B, jnp.bfloat16)
    c_pkd = tr.init_cache_from_segments(packed, B, jnp.bfloat16)
    x_chunk = jnp.asarray(0.5 * rng.randn(B, 8, S), jnp.bfloat16)
    _, c_std = tr.prefill_chunk(dec, c_std, x_chunk, jnp.int32(0), 2,
                                fp16=True)
    _, c_pkd = tr.prefill_chunk(packed, c_pkd, x_chunk, jnp.int32(0), 2,
                                fp16=True)
    c_pkd = tr.pack_segment_caches(packed, c_pkd)

    ref = jax.jit(lambda c, x, t: tr.decode_step(dec, c, x, t, fp16=True,
                                                 fp16_out=True))
    mkp = jax.jit(lambda c, x, t: tr.decode_step(packed, c, x, t, fp16=True,
                                                 fp16_out=True))
    for t in range(8, n_ctx):
        x = jnp.asarray(0.5 * rng.randn(B, 1, S), jnp.bfloat16)
        y_std, c_std = ref(c_std, x, jnp.asarray(t))
        y_pkd, c_pkd = mkp(c_pkd, x, jnp.asarray(t))
        err = float(jnp.max(jnp.abs(y_std.astype(jnp.float32)
                                    - y_pkd.astype(jnp.float32))))
        mag = float(jnp.max(jnp.abs(y_std.astype(jnp.float32)))) + 1e-6
        assert err < 0.03 * max(mag, 1.0), (t, err, mag)

def test_packed_params_as_jit_arguments():
    """The staged decode passes packed params INTO jit as an argument pytree
    (prior.sample_init) — every leaf becomes a tracer there. Pattern
    metadata must come from the static schedule, not from leaves (a stored
    Python-int 'flat_func' leaf broke cache init with
    TracerBoolConversionError on the real 1b top)."""
    tr, dec, packed, (S, n_ctx, blocks, B) = _setup(order=12)

    @jax.jit
    def init_and_step(pk, x):
        cache = tr.init_cache_from_segments(pk, B, jnp.bfloat16)
        y, cache = tr.decode_step(pk, cache, x, jnp.int32(0), fp16=True,
                                  fp16_out=True)
        return y

    x = jnp.asarray(np.random.RandomState(0).randn(B, 1, S), jnp.bfloat16)
    y = init_and_step(packed, x)
    assert y.shape == (B, 1, S) and bool(jnp.all(jnp.isfinite(
        y.astype(jnp.float32))))

def test_mixed_packed_and_xla_flat_f6():
    """Flat f6 layers stay on the XLA path (no enc_proj packing for flats)
    while the scan segments around them pack — the mixed megakernel/XLA
    decode interleaving must stay token-identical. depth 19 order 10 ends
    in a flat f6 after six packed (1,2,3) groups."""
    S, n_ctx, blocks, depth, B, enc_l = 64, 16, 4, 19, 2, 16
    tr = Transformer(n_in=S, n_ctx=n_ctx, n_head=2, n_depth=depth,
                     attn_order=10, blocks=blocks, m_attn=0.25, m_mlp=1.0,
                     mask=True, encoder_dims=enc_l)
    assert tr.decode_plan[-1] == ("flat", 18)
    params = tr.init(jax.random.key(5))
    dec = tr.prepare_decode_params(params)
    packed = tr.pack_stack_segments(dec)
    kinds = [isinstance(p, dict) and "stack_packed" in p for p in packed]
    assert kinds == [True, False], kinds  # packed scan + standard XLA flat

    rng = np.random.RandomState(6)
    enc_kv = jnp.asarray(0.5 * rng.randn(B, enc_l, S), jnp.bfloat16)
    c_std = tr.init_cache_from_segments(dec, B, jnp.bfloat16,
                                        encoder_kv=enc_kv)
    c_pkd = tr.init_cache_from_segments(packed, B, jnp.bfloat16,
                                        encoder_kv=enc_kv)
    ref = jax.jit(lambda c, x, t: tr.decode_step(dec, c, x, t, fp16=True,
                                                 fp16_out=True))
    mkp = jax.jit(lambda c, x, t: tr.decode_step(packed, c, x, t, fp16=True,
                                                 fp16_out=True))
    for t in range(n_ctx):
        x = jnp.asarray(0.5 * rng.randn(B, 1, S), jnp.bfloat16)
        y_std, c_std = ref(c_std, x, jnp.asarray(t))
        y_pkd, c_pkd = mkp(c_pkd, x, jnp.asarray(t))
        err = float(jnp.max(jnp.abs(y_std.astype(jnp.float32)
                                    - y_pkd.astype(jnp.float32))))
        mag = float(jnp.max(jnp.abs(y_std.astype(jnp.float32)))) + 1e-6
        assert err < 0.03 * max(mag, 1.0), (t, err, mag)
