"""Whole-stack decode megakernel for [1,2,3]-cycle priors (attn_order 2).

One `pallas_call` per sampled token runs ALL n_depth layers of an order-2
prior (the upsamplers — the dominant cost of the sampling cascade, SURVEY
§3.2) instead of ~10 XLA kernels per layer. The decode step at 1b/5b scale
is HBM-bandwidth-bound on the weight stream (~3·S² bf16 per layer); the XLA
path pays ~1.5 ms/token of per-kernel fixed costs across 72 layers on top of
the ~2 ms weight stream. This kernel streams the weights through a shared
ping-pong canvas with double-buffered DMA (guide pattern) and does
LayerNorm / qkv / ring-cache attention / proj / MLP for each layer
in-kernel, so a token step is a single launch whose cost approaches the
weight-stream roofline.

Replaces (TPU-native, not a translation): the reference's per-token Python
loop over torch modules (jukebox/prior/autoregressive.py:199-249 +
factored_attention.py decode paths). Ring retention matches
models/attention.py exactly, but the kernel owns a slot-leading, lane-padded
cache layout so every dynamic index lands on a leading memref dim (Mosaic
requires last-dim slices to be tile-aligned):
  func 1 (row):        K/V [G, bc, B, Ap], slot t % bc, mask slots <= t % bc
  func 2 (column):     K/V [G, bc, blocks, B, Ap], write (t % bc, t // bc),
                       read column t % bc, mask slots <= t // bc
  func 3 (prev-row):   K/V [G, 2, bc, B, Ap] two rings; write ring
                       (t//bc) % 2 slot t % bc, read ring ((t//bc)-1) % 2,
                       no mask
with Ap = A rounded up to the lane tile. pack_caches/unpack_caches convert
to/from the standard [G, B, slots, A] layout (prefill -> decode handoff).

Numerics mirror ops/core.py: LayerNorm accumulates fp32 (eps 1e-5), matmuls
accumulate fp32 and round to the activation dtype, attention uses the
reference's fused q*s @ k*s scale (factored_attention.py:82-88) with
softmax in fp32, quick_gelu MLP, residual x + a + m (res_scale folded in).

Patterns may be any ordering of {1, 2, 3} (order-12 plans produce rotations
like (2, 3, 1)), interleaved with the special funcs:
  func 6 (cross-attn):  read-only [G, enc_rows, B, Ap] encoder cache,
                        q-only projection, no write-back
  func 7 (prime):       [G, prime_rows+1, B, Ap] cache of the lyric-prefix
                        K/V; writes land at min(t, prime_rows) (the last row
                        is a garbage slot for the gen phase, matching the
                        reference's out-of-range drop, models/attention.py
                        _write_token), reads mask slots <= min(t, pr-1)
                        with the current token patched in while t < pr
  func 0 (dense):       full-context ring [G, f0_rows, B, Ap]; the read is
                        CHUNKED (f0_chunk rows per DMA) with an online-
                        softmax accumulation — the whole-cache read does not
                        fit VMEM at 8k ctx — over t//chunk+1 live chunks
so the order-12 top stacks (specials included) decode in-kernel. Multi-head
runs as a static loop over lane-aligned head_dim slices (the 1b top's
hd=256) or full-width masked-head ops (the 5b top's hd=150).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9  # matches models/attention.py mask fill


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _piece_width(S, lane, cap=512):
    """Largest divisor of S that is a lane multiple and <= cap."""
    for d in range(min(S, cap), 0, -1):
        if S % d == 0 and d % lane == 0:
            return d
    # no lane-aligned divisor (tiny test widths): whole-matmul pieces.
    # Unaligned pieces only compile in interpret mode — production widths
    # (all jukebox upsamplers) have lane-aligned divisors.
    for d in range(min(S, cap), 0, -1):
        if S % d == 0:
            return d
    raise ValueError(f"no piece width for S={S}")


F0_CHUNK_CAP = 512  # rows per func-0 cache-read DMA (tests shrink it)


def _f0_geom(rows, cap=None):
    """(padded_rows, chunk) for the func-0 ring: caches <= cap rows read in
    one DMA; larger ones pad to a cap multiple and stream cap rows per
    chunk. Both the cache builder and the kernel derive the chunk from the
    allocated row count, so they always agree."""
    cap = F0_CHUNK_CAP if cap is None else cap
    if rows <= cap:
        return rows, rows
    return _round_up(rows, cap), cap


def _piece_width2(Sp, Smp, lane, cap=512):
    """Largest common divisor of the (lane-padded) model and MLP widths
    that is a lane multiple and <= cap — both are lane multiples, so a
    lane-aligned piece always exists."""
    for d in range(min(Sp, Smp, cap), 0, -1):
        if Sp % d == 0 and Smp % d == 0 and d % lane == 0:
            return d
    for d in range(min(Sp, Smp, cap), 0, -1):
        if Sp % d == 0 and Smp % d == 0:
            return d
    raise ValueError(f"no piece width for Sp={Sp}, Smp={Smp}")


# ---------------------------------------------------------------------------
# Host-side packing: stacked scan-segment params -> chunk-major arrays
# ---------------------------------------------------------------------------

def pack_decode_params(p_seg, lane=128, np_=np, quantize=False,
                       pat=(1, 2, 3)):
    """Pack a ("scan", pat, starts) segment's stacked params (tuple of
    len(pat) trees, each leaf [G, ...]) into the chunk-major, lane-padded
    layout the kernel DMAs:

      w_qkv[j]: [G, 3,      S,  Ap]  (q | k | v column blocks of c_attn,
                                      columns zero-padded A -> Ap;
                                      [G, 1, S, Ap] for f6 layers — their
                                      K/V come from the encoder cache)
      w_proj[j]:[G, S//PW,  Ap, PW]  (column blocks of c_proj, rows padded)
      w_m1[j]:  [G, Sm//PW, S,  PW]
      w_m2[j]:  [G, S//PW,  Sm, PW]

    Every DMA is then a whole [.., rows, cols] block with tile-aligned rows
    and cols. Weights cast to bf16; biases/LN stay fp32.
    """
    packed = []
    for j, f in enumerate(pat):
        p = p_seg[j]
        wq = np_.asarray(p["attn"]["c_attn"]["w"], np_.float32)
        bq = np_.asarray(p["attn"]["c_attn"]["b"], np_.float32)
        wp = np_.asarray(p["attn"]["c_proj"]["w"], np_.float32)
        bp = np_.asarray(p["attn"]["c_proj"]["b"], np_.float32)
        w1 = np_.asarray(p["mlp"]["c_fc"]["w"], np_.float32)
        b1 = np_.asarray(p["mlp"]["c_fc"]["b"], np_.float32)
        w2 = np_.asarray(p["mlp"]["c_proj"]["w"], np_.float32)
        b2 = np_.asarray(p["mlp"]["c_proj"]["b"], np_.float32)
        G, S, qcols = wq.shape
        n_q = 1 if f == 6 else 3  # f6: q-only projection
        A = qcols // n_q
        Sm = w1.shape[-1]
        Ap = _round_up(A, lane)
        # widths with no lane-aligned divisor (the 5b top's S=4800) pad to
        # the lane tile: padded rows/cols are zero weights + zero biases +
        # zero LN gains, so the padded activation columns stay exactly 0
        # through every layer (the kernel's LayerNorm masks its statistics)
        Sp = _round_up(S, lane)
        Smp = _round_up(Sm, lane)
        PW = _piece_width2(Sp, Smp, lane)
        assert wp.shape == (G, A, S) and w2.shape == (G, Sm, S)

        def pad_axis(w, axis, target):
            cur = w.shape[axis]
            if cur == target:
                return w
            shape = list(w.shape)
            shape[axis] = target - cur
            return np_.concatenate(
                [w, np_.zeros(shape, w.dtype)], axis=axis)

        def cols(w, piece):  # [G, K, N] -> [G, N//piece, K, piece]
            gg, kk, nn = w.shape
            return np_.ascontiguousarray(
                w.reshape(gg, kk, nn // piece, piece).transpose(0, 2, 1, 3))

        wq3 = cols(pad_axis(wq, 1, Sp), A)      # [G, n_q, Sp, A]
        wq3 = pad_axis(wq3, 3, Ap)
        bq3 = pad_axis(bq.reshape(G, n_q, A), 2, Ap)
        wp_pad = pad_axis(pad_axis(wp, 1, Ap), 2, Sp)   # [G, Ap, Sp]
        w1p = pad_axis(pad_axis(w1, 1, Sp), 2, Smp)     # [G, Sp, Smp]
        w2p = pad_axis(pad_axis(w2, 1, Smp), 2, Sp)     # [G, Smp, Sp]

        bf16 = jnp.bfloat16
        d = dict(
            w_qkv=wq3,                              # [G, n_q, Sp, Ap] fp32
            w_proj=cols(wp_pad, PW),                # [G, Sp//PW, Ap, PW]
            w_m1=cols(w1p, PW),                     # [G, Smp//PW, Sp, PW]
            w_m2=cols(w2p, PW),                     # [G, Sp//PW, Smp, PW]
            # biases in the activation dtype (the XLA dense path casts b to
            # x.dtype too); LN params stay fp32 like ops.core.layer_norm
            b_qkv=bq3.astype(bf16),
            b_proj=pad_axis(bp, 1, Sp).reshape(G, Sp // PW, PW).astype(bf16),
            b_m1=pad_axis(b1, 1, Smp).reshape(G, Smp // PW, PW).astype(bf16),
            b_m2=pad_axis(b2, 1, Sp).reshape(G, Sp // PW, PW).astype(bf16),
            ln0_g=pad_axis(np_.asarray(p["ln_0"]["g"], np_.float32), 1, Sp),
            ln0_b=pad_axis(np_.asarray(p["ln_0"]["b"], np_.float32), 1, Sp),
            ln1_g=pad_axis(np_.asarray(p["ln_1"]["g"], np_.float32), 1, Sp),
            ln1_b=pad_axis(np_.asarray(p["ln_1"]["b"], np_.float32), 1, Sp),
        )
        for key in ("w_qkv", "w_proj", "w_m1", "w_m2"):
            if quantize:
                # weight-only int8, per-out-column absmax scales over the
                # input axis, computed from the fp32 source (bit-identical to
                # ops.core.quantize_dense — no intermediate bf16 rounding);
                # halves the per-token HBM weight stream. The matmul
                # dequantises AFTER accumulation (scales per out column
                # factor out of the contraction).
                w = np_.asarray(d[key], np_.float32)
                s = np_.max(np_.abs(w), axis=-2, keepdims=True) / 127.0
                s = np_.maximum(s, 1e-12)
                d[key] = np_.clip(np_.round(w / s), -127, 127).astype(np_.int8)
                d["s" + key[1:]] = s[..., 0, :].astype(np_.float32)
            else:
                d[key] = d[key].astype(bf16)
        packed.append(d)
    return packed


_PACK_KEYS = ("w_qkv", "w_proj", "w_m1", "w_m2",
              "b_qkv", "b_proj", "b_m1", "b_m2",
              "ln0_g", "ln0_b", "ln1_g", "ln1_b")
_SCALE_KEYS = ("s_qkv", "s_proj", "s_m1", "s_m2")


def _pack_keys(quantize):
    return _PACK_KEYS + _SCALE_KEYS if quantize else _PACK_KEYS


def _flatten_packed(packed):
    keys = _pack_keys("s_qkv" in packed[0])
    return [packed[j][k] for j in range(len(packed)) for k in keys]


# ---------------------------------------------------------------------------
# Cache layout conversion (standard [G, B, slots, A] <-> kernel layout)
# ---------------------------------------------------------------------------

SCALE_LANES = 128  # lane-tile row width of the int8-cache scale buffers


def pack_caches(c_seg, bc, pat=(1, 2, 3), lane=128, xp=jnp,
                sublane=8, quantize=False):
    """Standard group-stacked caches (tuple of len(pat) {"k","v"} trees from
    init_cache_from_segments, in pattern-position order) -> kernel
    slot-leading lane-padded 2*len(pat)-tuple (k_pat0, v_pat0, k_pat1, ...).
    f6 entries ([G, B, enc_len, A] projected encoder K/V) become read-only
    [G, enc_len, B, Ap] buffers.

    quantize=True stores each K/V row as symmetric per-(slot, batch) int8
    (absmax over A / 127) with the scale in a parallel [..., B, SCALE_LANES]
    bf16 buffer (lane 0 holds the value; the kernel's writes broadcast it
    across the row and its reads lane-reduce, so both layouts agree). The
    output becomes a 4*len(pat)-tuple (k, v, k_scale, v_scale per position)
    — HALVES the dominant ring-cache HBM bytes and read bandwidth."""
    A = c_seg[0]["k"].shape[-1]
    Ap = _round_up(A, lane)

    def padA(x, a=None, ap=None):
        a = A if a is None else a
        ap = Ap if ap is None else ap
        if ap == a:
            return x
        cfg = [(0, 0, 0)] * (x.ndim - 1) + [(0, ap - a, 0)]
        if xp is jnp:
            return lax.pad(x, xp.asarray(0, x.dtype), cfg)
        return np.concatenate(
            [x, np.zeros(x.shape[:-1] + (ap - a,), x.dtype)], axis=-1)

    B = c_seg[0]["k"].shape[1]
    Bp = _round_up(B, sublane)

    def padB(x):
        # Mosaic slices along the sublane axis must be 8-aligned; pad the
        # batch dim (second-to-last after conversion) so bs 3/4 decode
        # compiles. Padded rows carry garbage and are sliced off on exit.
        if Bp == B:
            return x
        cfg = [(0, 0, 0)] * x.ndim
        cfg[-2] = (0, Bp - B, 0)
        if xp is jnp:
            return lax.pad(x, xp.asarray(0, x.dtype), cfg)
        widths = [(w0, w1) for w0, w1, _ in cfg]
        return np.pad(x, widths)

    def pad_rows(x, target):
        # leading slot-axis pad (f7 garbage row / f0 chunk-multiple pad)
        if x.shape[1] == target:
            return x
        cfg = [(0, 0, 0)] * x.ndim
        cfg[1] = (0, target - x.shape[1], 0)
        if xp is jnp:
            return lax.pad(x, xp.asarray(0, x.dtype), cfg)
        return np.pad(x, [(w0, w1) for w0, w1, _ in cfg])

    def convert(f, c, after, scale=False):
        # serialize conversions: each transpose materialises a full copy,
        # so letting XLA overlap all of them doubles the cache HBM (the f2
        # pair alone is 9 GB at 1b bs=24). The barrier makes conversion i
        # depend on conversion i-1's result, so each source buffer dies
        # before the next copy allocates: peak = all sources + ONE target.
        if xp is jnp and after is not None:
            c, _ = lax.optimization_barrier((c, after))
        pA = (lambda x: padA(x, 1, SCALE_LANES)) if scale else padA
        if f == 2:               # [G,B,bc,bl,A] -> [G,bc,bl,Bp,Ap]
            c = padB(pA(xp.transpose(c, (0, 2, 3, 1, 4))))
        else:                    # [G,B,slots,A] -> [G,slots,Bp,Ap]
            c = padB(pA(xp.transpose(c, (0, 2, 1, 3))))
            if f == 3:           # [G,2bc,Bp,Ap] -> [G,2,bc,Bp,Ap]
                c = c.reshape(c.shape[0], 2, bc, *c.shape[2:])
            elif f == 7:         # + one garbage row for gen-phase writes
                c = pad_rows(c, c.shape[1] + 1)
            elif f == 0:         # pad slots to a chunk multiple
                c = pad_rows(c, _f0_geom(c.shape[1])[0])
        return c

    keys = ("k", "v", "ks", "vs") if quantize else ("k", "v")

    def source(j, key):
        c = c_seg[j][key[0] if key in ("ks", "vs") else key]
        if not quantize:
            return c
        cf = c.astype(xp.float32) if xp is jnp else np.asarray(c, np.float32)
        s = xp.max(xp.abs(cf), axis=-1, keepdims=True) / 127.0
        s = xp.maximum(s, 1e-8)
        if key in ("ks", "vs"):
            import ml_dtypes
            return s.astype(jnp.bfloat16 if xp is jnp else ml_dtypes.bfloat16)
        q = xp.clip(xp.round(cf / s), -127, 127)
        return q.astype(xp.int8 if xp is np else jnp.int8)

    # biggest arrays first (f2 >> f1/f3/f6), so the largest source is freed
    # while the small ones still pend
    order = sorted(((j, key) for j in range(len(pat)) for key in keys),
                   key=lambda jk: (pat[jk[0]] != 2, jk[1] in ("ks", "vs")))
    done = {}
    prev = None
    for j, key in order:
        prev = done[(j, key)] = convert(pat[j], source(j, key), prev,
                                        scale=key in ("ks", "vs"))
    return tuple(done[(j, key)] for j in range(len(pat)) for key in keys)


def init_kernel_caches(G, bc, blocks, B, A, pat=(1, 2, 3), lane=128,
                       dtype=jnp.bfloat16, sublane=8, prime_rows=0,
                       f0_rows=0, quantize=False):
    """Fresh zero caches directly in the kernel's slot-leading layout
    (equivalent to pack_caches(init_cache_from_segments(...)) without
    materializing the standard layout). prime_rows/f0_rows give the f7
    prime cache length (_prime_len) and the f0 ring's true slot count.
    quantize=True allocates int8 K/V plus bf16 scale buffers (4 per
    position, see pack_caches)."""
    assert 6 not in pat, "f6 caches hold projected encoder K/V, not zeros"
    Ap = _round_up(A, lane)
    B = _round_up(B, sublane)
    if quantize:
        dtype = jnp.int8
    z = lambda *s: jnp.zeros(s, dtype)
    zs = lambda *s: jnp.zeros(s[:-1] + (SCALE_LANES,), jnp.bfloat16)
    shapes = {1: (G, bc, B, Ap), 2: (G, bc, blocks, B, Ap),
              3: (G, 2, bc, B, Ap)}
    if 7 in pat:
        shapes[7] = (G, prime_rows + 1, B, Ap)
    if 0 in pat:
        shapes[0] = (G, _f0_geom(f0_rows)[0], B, Ap)
    out = []
    for f in pat:
        out += [z(*shapes[f]), z(*shapes[f])]
        if quantize:
            out += [zs(*shapes[f]), zs(*shapes[f])]
    return tuple(out)


def unpack_caches(c6, A, pat=(1, 2, 3), B=None, f0_rows=None,
                  dtype=jnp.bfloat16):
    """Kernel layout -> standard tuple of len(pat) {"k","v"} trees. B slices
    off the sublane batch padding (None keeps every row). f0_rows slices the
    func-0 ring back to its true slot count (chunk-multiple pad dropped).
    int8 caches (4 arrays per position) are dequantised to `dtype`."""
    quant = len(c6) == 4 * len(pat)
    stride = 4 if quant else 2

    def unpadB(x):  # [..., Bp, A] -> [..., B, A]
        return x if B is None else x[..., :B, :]

    def mk(a):
        def t1(x):  # [G,bc,Bp,Ap] -> [G,B,bc,A]
            return jnp.transpose(unpadB(x[..., :a]), (0, 2, 1, 3))

        def t2(x):  # [G,bc,bl,Bp,Ap] -> [G,B,bc,bl,A]
            return jnp.transpose(unpadB(x[..., :a]), (0, 3, 1, 2, 4))

        def t3(x):  # [G,2,bc,Bp,Ap] -> [G,B,2bc,A]
            x = unpadB(x[..., :a])
            g, two, bc_, b, _ = x.shape
            return jnp.transpose(x.reshape(g, two * bc_, b, a), (0, 2, 1, 3))

        def t7(x):  # [G,pr+1,Bp,Ap] -> [G,B,pr,A] (garbage row dropped)
            return t1(x[:, :-1])

        def t0(x):  # [G,Npad,Bp,Ap] -> [G,B,N,A]
            return t1(x if f0_rows is None else x[:, :f0_rows])

        return {1: t1, 2: t2, 3: t3, 6: t1, 7: t7, 0: t0}

    conv, conv_s = mk(A), mk(1)

    def cache(j, key):
        i = stride * j + ("k", "v").index(key)
        c = conv[pat[j]](c6[i])
        if not quant:
            return c
        # lane 0 of the scale row holds the value (kernel writes broadcast
        # it across the row; pack_caches zero-pads lanes 1+)
        s = conv_s[pat[j]](c6[stride * j + 2 + ("k", "v").index(key)])
        return (c.astype(jnp.float32) * s.astype(jnp.float32)).astype(dtype)

    return tuple({"k": cache(j, "k"), "v": cache(j, "v")}
                 for j in range(len(pat)))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _kernel(S, A, Ap, Sm, PW, Sp, Smp, bc, blocks, G, B, res_scale, N_SLOTS,
            quantized, cache_q, pat, H, sliced_heads, matmul_heads, enc_rows,
            prime_rows, f0_rows, f0_chunk, t_ref, *refs):
    """refs: len(pat)×12 (or ×16 with int8 scales) packed param refs
    (weights ANY, biases/LN/scales VMEM), 2*len(pat) cache refs (ANY), x_in;
    outputs x_out + 2*len(pat) aliased cache outs; scratch: canvas, kbuf,
    vbuf, kstage, vstage, wsem, crsem, wbsem. pat entries in {0,1,2,3,6,7};
    f6 positions attend a read-only [G, enc_rows, B, Ap] encoder cache
    with a q-only projection (no write-back); f7 a [G, prime_rows+1, B, Ap]
    prime cache (see module docstring); f0 a [G, f0_rows(padded), B, Ap]
    full-context ring read f0_chunk rows at a time with online softmax.

    cache_q: int8 ring caches — 4 refs per position (k, v int8 + bf16
    per-(slot, batch) scale rows [.., B, SCALE_LANES]), 4 extra scratch
    buffers (ksbuf/vsbuf/ksstage/vsstage). Rows quantise on write (absmax
    over the lane axis / 127); reads stay int8 through the score/value
    reductions and the scales fold into the [B, L] score matrix and the
    [L, B] softmax weights — O(B·L) dequant fixups like the new-token
    patch, never an O(L·B·Ap) dequant pass. HALVES cache HBM bytes and
    the cache-read half of the decode roofline."""
    P = len(pat)
    n_per = 4 if cache_q else 2
    n_pp = Sp // PW
    n_m1 = Smp // PW
    n_m2 = Sp // PW
    n_qkv = [1 if f == 6 else 3 for f in pat]
    pieces_j = [nq + n_pp + n_m1 + n_m2 for nq in n_qkv]
    off_j = [sum(pieces_j[:j]) for j in range(P)]
    tot_pg = sum(pieces_j)

    def lin_to_jl(lin):
        for j in range(P - 1, -1, -1):
            if lin >= off_j[j]:
                return j, lin - off_j[j]
        raise AssertionError(lin)

    keys = _pack_keys(quantized)
    per = len(keys)
    params = [dict(zip(keys, refs[j * per:(j + 1) * per]))
              for j in range(P)]
    off = P * per
    n_c = n_per * P
    cache_flat = refs[off:off + n_c]
    x_in = refs[off + n_c]
    x_out = refs[off + n_c + 1]
    cache_out_flat = refs[off + n_c + 2:off + 2 * n_c + 2]
    scratch = refs[off + 2 * n_c + 2:]
    (canvas, kbuf, vbuf, kstage, vstage, wsem, crsem, wbsem) = scratch[:8]
    if cache_q:
        ksbuf, vsbuf, ksstage, vsstage = scratch[8:]
        stages_all = (kstage, vstage, ksstage, vsstage)
    else:
        stages_all = (kstage, vstage)

    t = t_ref[0, 0]
    s_row = t % bc          # func-1 slot / func-2 column
    b_col = t // bc         # func-2 block row
    ring_w = (t // bc) % 2  # func-3 write ring
    ring_r = ((t // bc) - 1) % 2
    hd = A // H
    scale = float(hd) ** -0.25

    cache_in = {j: tuple(cache_flat[n_per * j + i] for i in range(n_per))
                for j in range(P)}
    cache_w = {j: tuple(cache_out_flat[n_per * j + i] for i in range(n_per))
               for j in range(P)}

    # -- weight-piece DMA plumbing: N_SLOTS-deep pipeline, issued
    #    (N_SLOTS-1) ahead so the DMA queue stays full through the attention
    #    bubble between the qkv and proj pieces ----------------------------
    def piece_geom(j, local):
        """(key, piece_idx, rows, cols) for layer-local piece index."""
        nq = n_qkv[j]
        if local < nq:
            return "w_qkv", local, Sp, Ap
        local -= nq
        if local < n_pp:
            return "w_proj", local, Ap, PW
        local -= n_pp
        if local < n_m1:
            return "w_m1", local, Sp, PW
        return "w_m2", local - n_m1, Smp, PW

    def piece_dma(j, local, g, slot):
        key, idx, rows, cols = piece_geom(j, local)
        return pltpu.make_async_copy(params[j][key].at[g, idx],
                                     canvas.at[slot, :rows, :cols],
                                     wsem.at[slot])

    def slot_of(g, lin):
        return (g * tot_pg + lin) % N_SLOTS

    def issue_next(j_cur, lin, g):
        """After consuming piece lin, start the DMA for piece
        lin + N_SLOTS - 1 (its slot was freed N_SLOTS-1 consumptions ago)."""
        nxt = lin + N_SLOTS - 1
        if nxt < tot_pg:
            nj, nl = lin_to_jl(nxt)
            piece_dma(nj, nl, g, slot_of(g, nxt)).start()
        else:
            nj, nl = lin_to_jl(nxt - tot_pg)
            @pl.when(g + 1 < G)
            def _():
                piece_dma(nj, nl, jnp.minimum(g + 1, G - 1),
                          slot_of(g + 1, nxt - tot_pg)).start()

    # canvas views by geometry (compute side)
    def canvas_rows(j, local, slot):
        _, _, rows, cols = piece_geom(j, local)
        return canvas[slot, :rows, :cols]

    def piece_mm(uv, j, local, slot, g):
        """uv @ piece (fp32 accumulate), dequantised per out column when the
        weights are int8 (weight-only; scales factor out of the dot)."""
        key, idx, _, _ = piece_geom(j, local)
        w = canvas_rows(j, local, slot)
        y = jnp.dot(uv, w.astype(uv.dtype),
                    preferred_element_type=jnp.float32)
        if quantized:
            y = y * params[j]["s" + key[1:]][g, idx]
        return y

    # warm-up: first N_SLOTS-1 pieces of group 0
    for c in range(min(N_SLOTS - 1, tot_pg)):
        nj, nl = lin_to_jl(c)
        piece_dma(nj, nl, 0, c % N_SLOTS).start()

    # -- cache read DMAs (slot-leading layouts; dynamic index on leading
    #    dims only). The cache pair at position j has the layout of func
    #    pat[j] (patterns may be rotations like (2,3,1)). -------------------
    def cache_read(j, g):
        """DMA list for position j's cache rows (k, v and — int8 caches —
        their bf16 scale rows; sems 0/1 for k/v, 4/5 for the scales)."""
        f = pat[j]
        bufs = cache_in[j]
        dsts = (kbuf, vbuf) + ((ksbuf, vsbuf) if cache_q else ())
        sems = (0, 1, 4, 5)
        if f == 1 or f == 3:
            rows = bc
        elif f == 2:
            rows = blocks
        elif f == 6:
            rows = enc_rows
        else:
            rows = prime_rows + 1  # incl. the gen-phase garbage row
        out = []
        for i, (src, dst) in enumerate(zip(bufs, dsts)):
            if f == 2:
                s = src.at[g, s_row]
            elif f == 3:
                s = src.at[g, ring_r]
            else:
                s = src.at[g]
            out.append(pltpu.make_async_copy(s, dst.at[:rows],
                                             crsem.at[sems[i]]))
        return out

    def f0_read(j, g, c):
        """Chunk-c read of an f0 ring into ping-pong slot c%2 (so chunk c+1
        streams while chunk c is in the online-softmax math; sems 2*(c%2)
        and 2*(c%2)+1 — plus 4 higher for the int8 scale rows — keep the
        two in-flight sets independent)."""
        bufs = cache_in[j]
        dsts = (kbuf, vbuf) + ((ksbuf, vsbuf) if cache_q else ())
        slot = (c % 2) * f0_chunk
        sem = 2 * (c % 2)
        sems = (sem, sem + 1, sem + 4, sem + 5)
        return [pltpu.make_async_copy(src.at[g, pl.ds(c * f0_chunk, f0_chunk)],
                                      dst.at[pl.ds(slot, f0_chunk)],
                                      crsem.at[sems[i]])
                for i, (src, dst) in enumerate(zip(bufs, dsts))]

    def group_body(g, _):
        x = x_out[:]                                   # [B, Sp]
        col_real = (lax.broadcasted_iota(jnp.int32, (1, Sp), 1) < S) \
            if Sp != S else None
        lin = 0

        for j in range(P):
            p = params[j]
            f = pat[j]
            # previous group's write-back of this layer's stage buffers
            # (f6 is read-only: nothing staged, nothing to wait on)
            if f != 6:
                @pl.when(g > 0)
                def _(j=j, f=f):
                    _wb_dma(j, f, cache_w, stages_all, wbsem, bc,
                            s_row, b_col, ring_w, jnp.maximum(g - 1, 0),
                            B, t, prime_rows).wait_all()

            if f == 0:
                # start the first ring chunk here (overlaps LN + qkv like the
                # single-shot reads); chunks then ping-pong inside the body
                for d in f0_read(j, g, jnp.int32(0)):
                    d.start()
                rds = ()
            else:
                rds = cache_read(j, g)
                for d in rds:
                    d.start()

            xf = x.astype(jnp.float32)
            if Sp == S:
                mu = jnp.mean(xf, axis=-1, keepdims=True)
                dx = xf - mu
            else:
                # padded columns are zero: sum/S is the true mean, but the
                # variance must exclude the (0 - mu) pad terms
                mu = jnp.sum(xf, axis=-1, keepdims=True) / S
                dx = jnp.where(col_real, xf - mu, 0.0)
            var = jnp.sum(jnp.square(dx), axis=-1, keepdims=True) / S
            u = (dx * lax.rsqrt(var + 1e-5) * p["ln0_g"][g]
                 + p["ln0_b"][g]).astype(x.dtype)      # [B, Sp]

            # ---- q (, k, v) pieces ------------------------------------------
            qkv = []
            for piece in range(n_qkv[j]):
                slot = slot_of(g, lin)
                piece_dma(j, lin - off_j[j], g, slot).wait()
                issue_next(j, lin, g)
                qkv.append(piece_mm(u, j, lin - off_j[j], slot, g)
                           + p["b_qkv"][g, piece])
                lin += 1

            if f == 6:
                q = qkv[0]                             # [B, Ap] fp32
                kbf = vbf = None
                L, lim, ins = enc_rows, None, None
            else:
                q, k, v = qkv                          # [B, Ap] fp32
                kbf = k.astype(x.dtype)
                vbf = v.astype(x.dtype)
                if f == 1:
                    L, lim, ins = bc, s_row, s_row
                elif f == 2:
                    L, lim, ins = blocks, b_col, b_col
                elif f == 7:
                    # traced lim/ins: mask grows while the prime prefill is
                    # still running (t < prime_rows); in the gen phase every
                    # prime slot is visible and ins=-1 patches nothing
                    L = prime_rows + 1
                    lim = jnp.minimum(t, prime_rows - 1)
                    ins = jnp.where(t < prime_rows, t, -1)
                elif f == 0:
                    L, lim, ins = None, None, t        # chunked path below
                else:
                    L, lim, ins = bc, None, None       # reads the PREV ring
                if cache_q:
                    # quantise the row on write: absmax over the lane axis
                    # (padded cols are exact zeros), scale broadcast across
                    # the SCALE_LANES row so reads can lane-reduce it back
                    ksc = jnp.maximum(jnp.max(jnp.abs(k), axis=-1,
                                              keepdims=True) / 127.0, 1e-8)
                    vsc = jnp.maximum(jnp.max(jnp.abs(v), axis=-1,
                                              keepdims=True) / 127.0, 1e-8)
                    kstage[j * B:(j + 1) * B, :] = jnp.clip(
                        jnp.round(k * (1.0 / ksc)), -127.0, 127.0
                    ).astype(jnp.int8)
                    vstage[j * B:(j + 1) * B, :] = jnp.clip(
                        jnp.round(v * (1.0 / vsc)), -127.0, 127.0
                    ).astype(jnp.int8)
                    ksstage[j * B:(j + 1) * B, :] = lax.broadcast_in_dim(
                        ksc, (B, SCALE_LANES), (0, 1)).astype(jnp.bfloat16)
                    vsstage[j * B:(j + 1) * B, :] = lax.broadcast_in_dim(
                        vsc, (B, SCALE_LANES), (0, 1)).astype(jnp.bfloat16)
                else:
                    kstage[j * B:(j + 1) * B, :] = kbf
                    vstage[j * B:(j + 1) * B, :] = vbf
                _wb_dma(j, f, cache_w, stages_all, wbsem, bc,
                        s_row, b_col, ring_w, g, B, t, prime_rows).start_all()

            if f == 0:
                # ---- dense full-context ring: chunked online softmax ------
                # t//CH + 1 live chunks of CH rows each; the current token's
                # score/value are patched in exactly like the single-shot
                # paths (its ring slot holds stale bytes while the write-back
                # DMA is in flight).
                CH = f0_chunk
                qs0 = q * scale
                kbf32 = kbf.astype(jnp.float32)
                vbf32 = vbf.astype(jnp.float32)
                lane_a = lax.broadcasted_iota(jnp.int32, (1, Ap), 1)
                hs_meta = []
                for h in range(H):
                    if sliced_heads:
                        hsl = slice(h * hd, (h + 1) * hd)
                        hs_meta.append((qs0[:, hsl], kbf32[:, hsl],
                                        vbf32[:, hsl], None, hd, hsl))
                    else:
                        mh = (lane_a // hd == h) & (lane_a < A)
                        hs_meta.append((jnp.where(mh, qs0, 0.0), kbf32,
                                        vbf32, mh, Ap, None))
                neg0 = jnp.full((B, 1), NEG, jnp.float32)
                zer0 = jnp.zeros((B, 1), jnp.float32)
                init = tuple((neg0, zer0, zer0,
                              jnp.zeros((B, w), jnp.float32))
                             for (_, _, _, _, w, _) in hs_meta)

                last_chunk = t // CH

                def f0_body(c, carry, _j=j):
                    # chunk c was started by the previous iteration (chunk 0
                    # by the pre-LN prologue); wait it, then kick chunk c+1
                    # into the other ping-pong slot so its HBM read overlaps
                    # this chunk's math
                    for d in f0_read(_j, g, c):
                        d.wait()

                    @pl.when(c + 1 <= last_chunk)
                    def _():
                        for d in f0_read(_j, g, c + 1):
                            d.start()

                    sl = (c % 2) * CH
                    if cache_q:
                        # int8 rows: defer BOTH the k*s attention scale and
                        # the row dequant to the [B, CH] score matrix
                        krc = kbuf[pl.ds(sl, CH)].astype(jnp.float32)
                        dqk = jnp.max(
                            ksbuf[pl.ds(sl, CH)].astype(jnp.float32),
                            axis=-1).T * scale                     # [B, CH]
                        dqv = jnp.max(
                            vsbuf[pl.ds(sl, CH)].astype(jnp.float32),
                            axis=-1).T                             # [B, CH]
                    else:
                        krc = kbuf[pl.ds(sl, CH)].astype(jnp.float32) * scale
                    vrc = vbuf[pl.ds(sl, CH)].astype(jnp.float32)
                    colsc = c * CH + lax.broadcasted_iota(jnp.int32,
                                                          (B, CH), 1)
                    nxt = []
                    for h, (qh, knh, vnh, mh, w, hsl) in enumerate(hs_meta):
                        krh = krc if hsl is None else krc[..., hsl]
                        vrh = vrc if hsl is None else vrc[..., hsl]
                        qb = lax.broadcast_in_dim(qh, (CH, B, w), (1, 2))
                        st = jnp.sum(qb * krh, axis=-1).T          # [B, CH]
                        if cache_q:
                            st = st * dqk
                        sc_new = jnp.sum(qh * knh * scale, axis=-1,
                                         keepdims=True)
                        st = jnp.where(colsc == t, sc_new, st)
                        st = jnp.where(colsc <= t, st, NEG)
                        m, l, wi, acc = carry[h]
                        m2 = jnp.maximum(m, jnp.max(st, axis=-1,
                                                    keepdims=True))
                        r = jnp.exp(m - m2)
                        p = jnp.exp(st - m2)
                        wi2 = wi * r + jnp.sum(
                            jnp.where(colsc == t, p, 0.0), axis=-1,
                            keepdims=True)
                        p = jnp.where(colsc == t, 0.0, p)
                        l2 = l * r + jnp.sum(p, axis=-1, keepdims=True)
                        pv = p * dqv if cache_q else p  # fold v row scales
                        sb = lax.broadcast_in_dim(pv.T, (CH, B, w), (0, 1))
                        acc2 = acc * r + jnp.sum(sb * vrh, axis=0)
                        nxt.append((m2, l2, wi2, acc2))
                    return tuple(nxt)

                carry = lax.fori_loop(0, last_chunk + 1, f0_body, init)
                o_heads, o_acc = [], None
                for h, (qh, knh, vnh, mh, w, hsl) in enumerate(hs_meta):
                    m, l, wi, acc = carry[h]
                    o_h = (acc + wi * vnh) / (l + wi)
                    if sliced_heads:
                        o_heads.append(o_h)
                    else:
                        o_h = jnp.where(mh, o_h, 0.0)
                        o_acc = o_h if o_acc is None else o_acc + o_h
                if sliced_heads:
                    o = (o_heads[0] if H == 1
                         else jnp.concatenate(o_heads, axis=-1))
                    if Ap != A:
                        o = jnp.concatenate(
                            [o, jnp.zeros((B, Ap - A), o.dtype)], axis=-1)
                else:
                    o = o_acc
                o = o.astype(x.dtype).astype(jnp.float32)
            elif matmul_heads:
                for d in rds:
                    d.wait()
                if cache_q:
                    # per-row dequant factors, folded into the [L, B, H]
                    # score tensor resp. the softmax weights (O(B·L·H))
                    sk_lb = jnp.max(ksbuf[:L].astype(jnp.float32),
                                    axis=-1)                       # [L, B]
                    sv_lb = jnp.max(vsbuf[:L].astype(jnp.float32),
                                    axis=-1)                       # [L, B]
                # ---- head-membership-matmul multi-head (hd not lane-aligned,
                # e.g. the 5b top's hd=150) ----------------------------------
                # The masked-head formulation repeats the two O(L·B·Ap)
                # VPU passes (score multiply-reduce, value apply) once per
                # head. Here the full-width elementwise product z = q·K is
                # computed ONCE and contracted with the static [Ap, H] 0/1
                # head-membership matrix on the MXU to get all heads' scores;
                # the per-head softmax weights are then expanded back to lane
                # space by the transposed membership matmul and applied to V
                # in ONE full-width pass. VPU traffic drops from 2H to ~3
                # full-width passes; the two membership dots are tiny MXU
                # work. Chunked over L (CL=128) so the z / W·M intermediates
                # stay a few MB regardless of L (f6 reads enc_rows=512).
                # Layout notes: B is sublane-padded, so [cl, B, Ap] <->
                # [cl*B, Ap] reshapes are layout-preserving; per-head score
                # extraction is an 8-lane masked reduce, not a lane slice.
                ia_h = lax.broadcasted_iota(jnp.int32, (Ap, H), 0)
                ih_h = lax.broadcasted_iota(jnp.int32, (Ap, H), 1)
                Mm = ((ia_h // hd == ih_h) & (ia_h < A)).astype(jnp.float32)
                ia_t = lax.broadcasted_iota(jnp.int32, (H, Ap), 1)
                ih_t = lax.broadcasted_iota(jnp.int32, (H, Ap), 0)
                MmT = ((ia_t // hd == ih_t) & (ia_t < A)).astype(jnp.float32)
                q2 = q * (scale * scale)                   # both scale factors
                if ins is not None:
                    kbf32 = kbf.astype(jnp.float32)
                    vbf32 = vbf.astype(jnp.float32)
                    sc_all = jnp.dot(q2 * kbf32, Mm,
                                     preferred_element_type=jnp.float32)
                cols = lax.broadcasted_iota(jnp.int32, (B, L), 1)
                CL = min(L, 128)
                sts = []
                for c0 in range(0, L, CL):
                    cl = min(CL, L - c0)
                    krc = kbuf[c0:c0 + cl].astype(jnp.float32)
                    qb = lax.broadcast_in_dim(q2, (cl, B, Ap), (1, 2))
                    z = (qb * krc).reshape(cl * B, Ap)
                    stc = jnp.dot(z, Mm,
                                  preferred_element_type=jnp.float32)
                    sts.append(stc.reshape(cl, B, H))
                st3 = (jnp.concatenate(sts, axis=0) if len(sts) > 1
                       else sts[0])                        # [L, B, H]
                if cache_q:
                    st3 = st3 * lax.broadcast_in_dim(sk_lb, (L, B, H),
                                                     (0, 1))
                W3 = jnp.zeros((L, B, H), jnp.float32)
                w_ins_all = None
                for h in range(H):
                    oneh = (lax.broadcasted_iota(jnp.int32, (1, 1, H), 2)
                            == h)
                    st = jnp.sum(jnp.where(oneh, st3, 0.0), axis=-1).T
                    if ins is not None:
                        sc_h = jnp.sum(jnp.where(oneh[0], sc_all, 0.0),
                                       axis=-1, keepdims=True)
                        st = jnp.where(cols == ins, sc_h, st)
                    if lim is not None:
                        st = jnp.where(cols <= lim, st, NEG)
                    smax = jnp.max(st, axis=-1, keepdims=True)
                    sexp = jnp.exp(st - smax)
                    w_bl = sexp / jnp.sum(sexp, axis=-1, keepdims=True)
                    if ins is not None:
                        w_ins = jnp.sum(jnp.where(cols == ins, w_bl, 0.0),
                                        axis=-1, keepdims=True)  # [B, 1]
                        w_bl = jnp.where(cols == ins, 0.0, w_bl)
                        w_ins_all = (w_ins if w_ins_all is None else
                                     jnp.concatenate([w_ins_all, w_ins],
                                                     axis=-1))
                    W3 = W3 + jnp.where(oneh, w_bl.T[:, :, None], 0.0)
                if cache_q:
                    # fold the V row scales into the softmax weights so the
                    # value apply consumes raw int8 rows
                    W3 = W3 * lax.broadcast_in_dim(sv_lb, (L, B, H), (0, 1))
                o = jnp.zeros((B, Ap), jnp.float32)
                for c0 in range(0, L, CL):
                    cl = min(CL, L - c0)
                    vrc = vbuf[c0:c0 + cl].astype(jnp.float32)
                    Wsel = jnp.dot(W3[c0:c0 + cl].reshape(cl * B, H), MmT,
                                   preferred_element_type=jnp.float32)
                    o = o + jnp.sum(Wsel.reshape(cl, B, Ap) * vrc, axis=0)
                if ins is not None:
                    w_field = jnp.dot(w_ins_all, MmT,
                                      preferred_element_type=jnp.float32)
                    o = o + w_field * vbf32
                o = o.astype(x.dtype).astype(jnp.float32)
            else:
                for d in rds:
                    d.wait()
                # buffers are slot-leading [L, B, Ap]; batched matvecs become
                # VPU broadcast-multiply-reduce (Mosaic supports neither
                # mid-axis shape casts nor batched dots with an empty lhs
                # non-contracting set). The current token's K/V never touch the
                # [L, B, Ap] buffers: its score is patched into the [B, L]
                # score matrix, and its value contribution is added as
                # w_ins * v_new after zeroing the stale slot's weight — O(B·L)
                # and O(B·Ap) fixups instead of O(L·B·Ap) merge passes.
                # Heads run as a static loop over lane-aligned hd slices.
                if cache_q:
                    # raw int8 rows; the k*s scale AND the per-row dequant
                    # fold into the [B, L] score matrix / [L, B] weights
                    kr = kbuf[:L].astype(jnp.float32)
                    dqk = jnp.max(ksbuf[:L].astype(jnp.float32),
                                  axis=-1).T * scale               # [B, L]
                    sv_lb = jnp.max(vsbuf[:L].astype(jnp.float32),
                                    axis=-1)                       # [L, B]
                else:
                    kr = kbuf[:L].astype(jnp.float32) * scale
                vr = vbuf[:L].astype(jnp.float32)
                qs = q * scale
                cols = lax.broadcasted_iota(jnp.int32, (B, L), 1)
                # heads: lane-aligned hd runs as sliced [.., hd] ops; otherwise
                # (e.g. the 5b top's hd=150) every op stays full [.., Ap] width
                # with a per-head iota column mask — identical Mosaic shape
                # formulations to the H=1 path, H x the VPU elementwise work
                # (noise next to the weight stream), zero alignment demands
                lane_a = lax.broadcasted_iota(jnp.int32, (1, Ap), 1)
                if ins is not None:
                    kbf32 = kbf.astype(jnp.float32)
                    vbf32 = vbf.astype(jnp.float32)
                o_heads = []
                o_acc = None
                for h in range(H):
                    knewh = vnewh = None
                    if sliced_heads:
                        hs = slice(h * hd, (h + 1) * hd)
                        qh, krh, vrh = qs[:, hs], kr[..., hs], vr[..., hs]
                        if ins is not None:
                            knewh, vnewh = kbf32[:, hs], vbf32[:, hs]
                        width = hd
                    else:
                        mh = (lane_a // hd == h) & (lane_a < A)    # [1, Ap]
                        qh = jnp.where(mh, qs, 0.0)
                        krh, vrh = kr, vr                          # masked via qh
                        if ins is not None:
                            knewh, vnewh = kbf32, vbf32
                        width = Ap
                    qb = lax.broadcast_in_dim(qh, (L, B, width), (1, 2))
                    # [B, L] orientation: lane-axis softmax is the only
                    # formulation Mosaic compiles after a lane reduction
                    # (sublane-axis keepdims hits a relayout bug)
                    st = jnp.sum(qb * krh, axis=-1).T              # [B, L]
                    if cache_q:
                        st = st * dqk
                    if ins is not None:
                        sc_new = jnp.sum(qh * knewh * scale,
                                         axis=-1, keepdims=True)   # [B, 1]
                        st = jnp.where(cols == ins, sc_new, st)
                    if lim is not None:
                        st = jnp.where(cols <= lim, st, NEG)
                    smax = jnp.max(st, axis=-1, keepdims=True)
                    sexp = jnp.exp(st - smax)
                    w_bl = sexp / jnp.sum(sexp, axis=-1, keepdims=True)
                    if ins is not None:
                        w_ins = jnp.sum(jnp.where(cols == ins, w_bl, 0.0),
                                        axis=-1, keepdims=True)    # [B, 1]
                        w_bl = jnp.where(cols == ins, 0.0, w_bl)
                    w_att = w_bl.T                                 # [L, B]
                    if cache_q:
                        w_att = w_att * sv_lb  # fold V row dequant
                    sb = lax.broadcast_in_dim(w_att, (L, B, width), (0, 1))
                    o_h = jnp.sum(sb * vrh, axis=0)                # [B, width]
                    if ins is not None:
                        o_h = o_h + w_ins * vnewh
                    if sliced_heads:
                        o_heads.append(o_h)
                    else:
                        # other heads' columns carry garbage weights: mask
                        o_h = jnp.where(mh, o_h, 0.0)
                        o_acc = o_h if o_acc is None else o_acc + o_h
                if sliced_heads:
                    o = o_heads[0] if H == 1 else jnp.concatenate(o_heads, axis=-1)
                    if Ap != A:
                        o = jnp.concatenate(
                            [o, jnp.zeros((B, Ap - A), o.dtype)], axis=-1)
                else:
                    o = o_acc                                      # [B, Ap]
                o = o.astype(x.dtype).astype(jnp.float32)

            # ---- proj pieces -------------------------------------------------
            a_cols = []
            for piece in range(n_pp):
                slot = slot_of(g, lin)
                piece_dma(j, lin - off_j[j], g, slot).wait()
                issue_next(j, lin, g)
                a_cols.append(piece_mm(o, j, lin - off_j[j], slot, g)
                              + p["b_proj"][g, piece])
                lin += 1
            a = jnp.concatenate(a_cols, axis=-1).astype(x.dtype)  # [B, S]

            # ---- MLP ---------------------------------------------------------
            r = x + a
            rf = r.astype(jnp.float32)
            if Sp == S:
                mu = jnp.mean(rf, axis=-1, keepdims=True)
                dr = rf - mu
            else:
                mu = jnp.sum(rf, axis=-1, keepdims=True) / S
                dr = jnp.where(col_real, rf - mu, 0.0)
            var = jnp.sum(jnp.square(dr), axis=-1, keepdims=True) / S
            um = (dr * lax.rsqrt(var + 1e-5) * p["ln1_g"][g]
                  + p["ln1_b"][g]).astype(x.dtype)

            h_cols = []
            for piece in range(n_m1):
                slot = slot_of(g, lin)
                piece_dma(j, lin - off_j[j], g, slot).wait()
                issue_next(j, lin, g)
                y = piece_mm(um, j, lin - off_j[j], slot, g)
                h_cols.append(_quick_gelu(y + p["b_m1"][g, piece]))
                lin += 1
            h = jnp.concatenate(h_cols, axis=-1).astype(x.dtype)  # [B, Sm]

            m_cols = []
            for piece in range(n_m2):
                slot = slot_of(g, lin)
                piece_dma(j, lin - off_j[j], g, slot).wait()
                issue_next(j, lin, g)
                m_cols.append(piece_mm(h, j, lin - off_j[j], slot, g)
                              + p["b_m2"][g, piece])
                lin += 1
            m = jnp.concatenate(m_cols, axis=-1).astype(x.dtype)  # [B, S]

            if res_scale == 1.0:
                x = x + a + m
            else:
                x = x + (a + m) * jnp.asarray(res_scale, x.dtype)

        x_out[:] = x
        return 0

    x_out[:] = x_in[:]
    lax.fori_loop(0, G, group_body, 0)

    # epilogue: final group's write-backs (f6 caches are read-only)
    for j in range(P):
        if pat[j] != 6:
            _wb_dma(j, pat[j], cache_w, stages_all, wbsem, bc,
                    s_row, b_col, ring_w, G - 1, B, t, prime_rows).wait_all()


class _WbPair:
    """The set of one-token write-back DMAs of layer j's k/v (+ scale)
    stages into the group-g ring caches. Reconstructible so start and wait
    can live at different pipeline points (same refs/sems)."""

    def __init__(self, dmas):
        self.dmas = dmas

    def start_all(self):
        for d in self.dmas:
            d.start()

    def wait_all(self):
        for d in self.dmas:
            d.wait()


def _wb_dma(j, f, cache_w, stages, wbsem, bc,
            s_row, b_col, ring_w, g, B, t=None, prime_rows=0):
    dmas = []
    for i, stage in enumerate(stages):
        out = cache_w[j][i]
        if f == 1:
            dst = out.at[g, s_row]
        elif f == 2:
            dst = out.at[g, s_row, b_col]
        elif f == 7:
            # prime prefix while t < prime_rows; the trailing garbage row
            # after (the reference drops gen-phase writes, attention.py f7)
            dst = out.at[g, jnp.minimum(t, prime_rows)]
        elif f == 0:
            dst = out.at[g, t]
        else:
            dst = out.at[g, ring_w, s_row]
        dmas.append(pltpu.make_async_copy(stage.at[pl.ds(j * B, B), :], dst,
                                          wbsem.at[j, i]))
    return _WbPair(dmas)


# ---------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def build_stack_decode(S, A, Sm, bc, blocks, G, B, res_scale=1.0,
                       lane=128, n_slots=None, dtype=jnp.bfloat16,
                       quantized=False, pat=(1, 2, 3), n_head=1,
                       interpret=False, head_mode="auto", enc_rows=0,
                       sublane=8, prime_rows=0, f0_rows=0,
                       cache_quantized=False):
    """Returns fn(flat_packed, caches6, x, t) -> (x_new, caches6).

    cache_quantized: the ring caches are stored int8 with per-(slot, batch)
    bf16 scale rows — 4 arrays per pattern position (see pack_caches) —
    halving cache HBM capacity and read bandwidth (the decode roofline's
    second term after the weight stream).

    flat_packed: list from _flatten_packed(pack_decode_params(p_seg, lane)).
    caches6: kernel-layout caches from pack_caches(..., pat, lane) — their
    batch dim padded to a sublane multiple (Mosaic slices along the
    sublane axis must be 8-aligned; the reference's 5b bs=3 decodes with
    5 garbage rows that never leave the kernel).
    x: [B, 1, S] activation (cast to bf16). t: int32 scalar token position.
    pat: the segment's attn_func pattern — any ordering of {1, 2, 3},
    optionally interleaved with the specials: 6 (encoder cross-attention,
    e.g. the 5b order-10 (1,2,3,1,2,3,1,2,3,6) segments; enc_rows gives the
    cache's row count), 7 (lyric-prime attention; prime_rows = the
    block-aligned _prime_len) and 0 (dense full-context; f0_rows = the
    ALLOCATED ring rows, a chunk multiple) — so the order-12 top schedules'
    flat special layers ride the kernel as single-layer segments.
    n_head > 1 requires only A % n_head == 0: lane-aligned head dims (1b
    top hd=256) decode via slices, others (5b top hd=150) via
    head-membership matmuls (one full-width q·K pass contracted with the
    static [Ap, H] membership matrix on the MXU, instead of H full-width
    masked VPU passes). head_mode forces "sliced"/"masked"/"matmul"
    ("masked" keeps the old per-head formulation; tests cover all three).
    """
    assert set(pat) <= {0, 1, 2, 3, 6, 7}, pat
    assert A % n_head == 0
    assert 6 not in pat or enc_rows > 0, "f6 segments need enc_rows"
    assert 7 not in pat or prime_rows > 0, "f7 segments need prime_rows"
    assert 0 not in pat or f0_rows > 0, "f0 segments need f0_rows"
    if 0 in pat:
        rows_pad, f0_chunk = _f0_geom(f0_rows)
        assert rows_pad == f0_rows, \
            f"f0 caches must be chunk-padded: {f0_rows} vs {rows_pad}"
    else:
        f0_chunk = 0
    P = len(pat)
    Ap = _round_up(A, lane)
    Sp = _round_up(S, lane)
    Smp = _round_up(Sm, lane)
    PW = _piece_width2(Sp, Smp, lane)
    Smax = max(Sp, Smp, Ap)
    if n_slots is None:
        # Pipeline depth of the weight-piece DMA queue (issued n_slots-1
        # ahead). 8 slots measure +6% int8 / +2% bf16 over 4 at 1b shapes
        # (scripts/chip_stack_decode.py); fall back to 4 when the canvas
        # would eat >40 MB of the 100 MB scoped-vmem budget (5b widths).
        # JUKEBOX_STACK_SLOTS overrides for A/B probes.
        env = os.environ.get("JUKEBOX_STACK_SLOTS")
        if env is not None:
            n_slots = int(env)
        else:
            bpe = 1 if quantized else jnp.dtype(dtype).itemsize
            canvas8 = 8 * Smax * max(Ap, PW) * bpe
            n_slots = 8 if canvas8 <= 40 * 1024 * 1024 else 4
    hd = A // n_head
    sliced_heads = (hd % lane == 0 and A % lane == 0) \
        if head_mode == "auto" else head_mode == "sliced"
    # multi-head with non-lane-aligned hd: head-membership matmuls beat the
    # per-head full-width masked passes; "masked" forces the old formulation
    matmul_heads = (not sliced_heads and n_head > 1
                    and head_mode in ("auto", "matmul"))
    max_rows = max(blocks if f == 2 else enc_rows if f == 6
                   else prime_rows + 1 if f == 7
                   else 2 * f0_chunk if f == 0   # ping-pong chunk slots
                   else bc for f in pat)

    Bp = _round_up(B, sublane)
    kernel = functools.partial(_kernel, S, A, Ap, Sm, PW, Sp, Smp, bc,
                               blocks, G, Bp, res_scale, n_slots, quantized,
                               cache_quantized,
                               tuple(pat), n_head, sliced_heads, matmul_heads,
                               enc_rows, prime_rows, f0_rows, f0_chunk)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pltpu.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    w_keys = {"w_qkv", "w_proj", "w_m1", "w_m2"}
    param_specs = [anym if k in w_keys else vmem
                   for _ in range(P) for k in _pack_keys(quantized)]
    n_c = (4 if cache_quantized else 2) * P
    cache_specs = [anym] * n_c
    canvas_dtype = jnp.int8 if quantized else dtype
    cbuf_dtype = jnp.int8 if cache_quantized else dtype
    scratch = [
        pltpu.VMEM((n_slots, Smax, max(Ap, PW)), canvas_dtype),
        pltpu.VMEM((max_rows, Bp, Ap), cbuf_dtype),  # K read buf
        pltpu.VMEM((max_rows, Bp, Ap), cbuf_dtype),  # V read buf
        pltpu.VMEM((P * Bp, Ap), cbuf_dtype),        # k write stage
        pltpu.VMEM((P * Bp, Ap), cbuf_dtype),        # v write stage
        pltpu.SemaphoreType.DMA((n_slots,)),         # weight piece sems
        pltpu.SemaphoreType.DMA((8,)),               # cache read sems: k/v
                                                     # 0-3 (f0 ping-pong),
                                                     # scales 4-7
        pltpu.SemaphoreType.DMA((P, 4 if cache_quantized else 2)),  # wb sems
    ]
    if cache_quantized:
        scratch += [
            pltpu.VMEM((max_rows, Bp, SCALE_LANES), jnp.bfloat16),  # K scales
            pltpu.VMEM((max_rows, Bp, SCALE_LANES), jnp.bfloat16),  # V scales
            pltpu.VMEM((P * Bp, SCALE_LANES), jnp.bfloat16),  # ks write stage
            pltpu.VMEM((P * Bp, SCALE_LANES), jnp.bfloat16),  # vs write stage
        ]

    def fn(flat_packed, caches, x, t):
        t2 = jnp.asarray(t, jnp.int32).reshape(1, 1)
        x2 = x.reshape(B, S).astype(dtype)
        if Bp != B or Sp != S:
            x2 = jnp.pad(x2, ((0, Bp - B), (0, Sp - S)))
        assert len(caches) == n_c, (len(caches), n_c, cache_quantized)
        assert caches[0].shape[-2] == Bp, (caches[0].shape, B, Bp)
        outs = pl.pallas_call(
            kernel,
            grid=(),
            in_specs=[smem] + param_specs + cache_specs + [vmem],
            out_specs=[vmem] + cache_specs,
            out_shape=[jax.ShapeDtypeStruct((Bp, Sp), dtype)] + [
                jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches],
            scratch_shapes=scratch,
            input_output_aliases={
                # inputs: t(0), P*keys params, n_c caches, x -> cache outs
                1 + len(param_specs) + i: 1 + i for i in range(n_c)},
            interpret=interpret,
            # 5b-width canvases (4 slots x 4864 x 1280 int8 ~ 25 MB) exceed
            # the default 16 MB scoped-vmem budget; the chip has 128 MB
            compiler_params=None if interpret else pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024),
        )(t2, *flat_packed, *caches, x2)
        x_new = outs[0][:B, :S].reshape(B, 1, S)
        return x_new, tuple(outs[1:1 + n_c])

    return fn
