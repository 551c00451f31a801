"""Factored (sparse) attention — TPU-native equivalent of
jukebox/transformer/factored_attention.py.

One module implements the reference's 8 attention primitives, selected by
`attn_func`:
    0 dense        attend to all previous positions
    1 block (row)  attend within your block of the [blocks, n_ctx//blocks] grid
    2 transpose    attend to the same column of previous blocks
    3 prev-block   attend to the whole previous block
    4 summary      attend to the last position of each previous block
    5 summary-spread  attend to the last `spread` positions of each block
    6 decode       cross-attention to fixed encoder K/V
    7 prime        attend to the first _prime_len positions (lyric prefix)

Three execution modes, all static-shape:
  * `apply`          — full-context training/teacher-forced forward. Each
                       pattern is a reshape + batched matmul (MXU-friendly);
                       masks are built once at trace time.
  * `decode_step`    — incremental decoding of ONE token against a
                       fixed-size ring cache. Replaces the reference's
                       grow-and-slice cache dict (factored_attention.py:355-381)
                       with per-pattern static buffers whose sizes equal the
                       reference's `_suff_cache_len` retention (:328-353):
                         func 0: [bs, n_ctx, s]          func 1: [bs, bc, s]
                         func 2: [bs, bc, blocks, s]     func 3: [bs, 2, bc, s]
                         func 6: encoder K/V             func 7: [bs, prime_cache, s]
  * `prefill_chunk`  — cache prefill of a block-aligned chunk of K*block_ctx
                       tokens (the reference's chunked priming,
                       autoregressive.py:284-327, re-done with static shapes).
"""

import math
from dataclasses import dataclass
import functools
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from jukebox_tpu.ops.core import _prec, dense, dense_init

NEG = -1e9

# Opt-in blocked (flash) kernel for the long-context dense layers; set
# JUKEBOX_FLASH_ATTN=0/1 or call set_flash_attn. Default: on for TPU
# backends, off elsewhere (the Pallas kernel would run interpreted on CPU).
_FLASH_ATTN = None
_FLASH_MIN_CTX = 2048


def set_flash_attn(enabled):
    global _FLASH_ATTN
    _FLASH_ATTN = bool(enabled)


def use_flash_attn():
    import os
    if _FLASH_ATTN is not None:
        return _FLASH_ATTN
    env = os.environ.get("JUKEBOX_FLASH_ATTN")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Static masks (trace-time numpy; reference get_mask, factored_attention.py:15-28)
# ---------------------------------------------------------------------------

# NOTE: masks are returned as *numpy* arrays. They are embedded as XLA
# constants at trace time; returning jax Arrays from an lru_cache would leak
# tracers across jit traces (JAX >= 0.9 stages constants as tracers).

@lru_cache(maxsize=None)
def _causal_mask(q_l, kv_l, offset):
    return np.tril(np.ones((q_l, kv_l), dtype=np.float32), offset)


@lru_cache(maxsize=None)
def _summary_mask(q_l, blocks, spread):
    """Query i attends the pad slot plus summaries of completed blocks
    (reference get_mask 'summary', factored_attention.py:25)."""
    bc = q_l // blocks
    tril = np.tril(np.ones((q_l, q_l), dtype=np.float32))
    m = tril.reshape(q_l, blocks, bc)[:, :-1, -spread:]
    m = np.pad(m, ((0, 0), (1, 0), (0, 0)), constant_values=1.0)
    return m.reshape(q_l, blocks * spread)


# ---------------------------------------------------------------------------
# Dense attention core (reference _attn, factored_attention.py:82-108)
# ---------------------------------------------------------------------------

def split_heads(x, n_head):
    B, L, D = x.shape
    return x.reshape(B, L, n_head, D // n_head).transpose(0, 2, 1, 3)


def merge_heads(x):
    B, H, L, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * hd)


def dense_attn(q, k, v, n_head, mask=None, record=False, dropout_rng=None,
               attn_dropout=0.0):
    """q,k,v: [B, L, n_state] (kv may have a different L). mask: [Lq, Lkv]
    or broadcastable; None = attend everywhere. Softmax in fp32, output in
    q.dtype. Scale uses the reference's fused q*s @ k*s trick (:82-88).
    attn_dropout applies to the softmax weights (reference :106), train
    only (dropout_rng given)."""
    hd = q.shape[-1] // n_head
    scale = 1.0 / math.sqrt(math.sqrt(hd))
    qh = split_heads(q, n_head) * jnp.asarray(scale, q.dtype)
    kh = split_heads(k, n_head) * jnp.asarray(scale, k.dtype)
    vh = split_heads(v, n_head)
    w = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, precision=_prec(q.dtype),
                   preferred_element_type=jnp.float32)
    if mask is not None:
        if isinstance(mask, str):
            # "causal": lazy iota comparison fused into the select — no
            # materialised [Lq, Lkv] constant (a trace-time tril at the 1b
            # 8448 ctx would be ~285 MB of fp32 rebuilt every forward)
            assert mask == "causal"
            lq, lk = w.shape[-2], w.shape[-1]
            row = lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
            col = lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
            w = jnp.where(row >= col, w, NEG)
        else:
            w = w * mask + NEG * (1 - mask)
    w = jax.nn.softmax(w, axis=-1)
    rec = w if record else None
    from jukebox_tpu.ops.core import dropout
    w = dropout(w, attn_dropout, dropout_rng)
    a = jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), vh, precision=_prec(q.dtype),
                   preferred_element_type=q.dtype)
    return merge_heads(a), rec


def _slot_leading_attn(q, k_t, v_t, n_head, mask=None):
    """Attention against slot-leading caches: q [B, C, S]; k_t/v_t
    [L, B, S_kv] (the decode megakernel's cache orientation). The layout
    difference folds into the dot_general (XLA contracts arbitrary dim
    orders natively), so reading a multi-GB cache during prefill never
    materialises a transposed copy. Same numerics as dense_attn (fused
    q*s @ k*s scale, fp32 softmax)."""
    B, C, S = q.shape
    hd = S // n_head
    scale = 1.0 / math.sqrt(math.sqrt(hd))
    qh = q.reshape(B, C, n_head, hd) * jnp.asarray(scale, q.dtype)
    kh = k_t.reshape(-1, B, n_head, hd) * jnp.asarray(scale, k_t.dtype)
    vh = v_t.reshape(-1, B, n_head, hd)
    w = jnp.einsum("bchd,lbhd->bhcl", qh, kh, precision=_prec(q.dtype),
                   preferred_element_type=jnp.float32)
    if mask is not None:
        w = w * mask + NEG * (1 - mask)
    w = jax.nn.softmax(w, axis=-1)
    a = jnp.einsum("bhcl,lbhd->bchd", w.astype(q.dtype), vh,
                   precision=_prec(q.dtype), preferred_element_type=q.dtype)
    return a.reshape(B, C, S)


@dataclass(frozen=True)
class FactoredAttention:
    n_in: int
    n_ctx: int
    n_state: int
    n_head: int
    attn_func: int = 0
    blocks: Optional[int] = None
    spread: Optional[int] = None
    encoder_dims: Optional[int] = None
    prime_len: Optional[int] = None
    mask: bool = False
    zero_out: bool = False
    init_scale: float = 1.0
    attn_dropout: float = 0.0
    resid_dropout: float = 0.0

    def __post_init__(self):
        assert self.n_state % self.n_head == 0
        if self.blocks is not None:
            assert self.n_ctx % self.blocks == 0

    @property
    def block_ctx(self):
        return self.n_ctx // self.blocks

    @property
    def _prime_len(self):
        """Block-aligned prime cache length (factored_attention.py:303-308)."""
        prime_blocks = (self.prime_len // self.blocks) + 1
        return prime_blocks * self.blocks

    # -- params ---------------------------------------------------------------

    def init(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        if self.attn_func == 6:
            p = {
                "c_attn": dense_init(r1, self.n_in, self.n_state, self.init_scale),
                "c_enc_kv": dense_init(r3, self.n_in, self.n_state * 2, self.init_scale),
            }
        else:
            p = {"c_attn": dense_init(r1, self.n_in, self.n_state * 3, self.init_scale)}
        p["c_proj"] = dense_init(r2, self.n_state, self.n_in, self.init_scale,
                                 zero_out=self.zero_out)
        return p

    # -- full-context forward (training / teacher-forced) ---------------------

    def _qkv(self, params, x, encoder_kv):
        if self.attn_func == 6:
            q = dense(params["c_attn"], x)
            kv = dense(params["c_enc_kv"], encoder_kv.astype(x.dtype))
            k, v = jnp.split(kv, 2, axis=2)
        else:
            assert encoder_kv is None
            q, k, v = jnp.split(dense(params["c_attn"], x), 3, axis=2)
        return q, k, v

    def apply(self, params, x, encoder_kv=None, record=False,
              dropout_rng=None):
        """x: [B, L, n_in] with L == n_ctx (full context). Returns
        (out [B, L, n_in], attn weights or None). dropout_rng enables the
        reference's train-time attn/resid dropout (factored_attention.py:106,
        :301)."""
        from jukebox_tpu.ops.core import dropout
        q, k, v = self._qkv(params, x, encoder_kv)
        if dropout_rng is not None:
            r_attn, r_resid = jax.random.split(dropout_rng)
        else:
            r_attn = r_resid = None
        a, w = self._pattern_full(q, k, v, record=record, dropout_rng=r_attn)
        if record and self.attn_func == 7:
            # keep music queries x lyric keys only (factored_attention.py:101-105)
            w = w[:, :, self.prime_len:, : self.prime_len]
        return dropout(dense(params["c_proj"], a), self.resid_dropout,
                       r_resid), w

    def _pattern_full(self, q, k, v, record=False, dropout_rng=None):
        dense_attn_ = functools.partial(dense_attn, dropout_rng=dropout_rng,
                                        attn_dropout=self.attn_dropout)
        f = self.attn_func
        B, L, S = v.shape
        if f == 0:
            # bf16 only: measured 2.1x faster than XLA dense on-chip at 1b
            # shapes; for fp32 XLA dense is faster AND keeps HIGHEST-precision
            # matmul semantics (PALLAS_CHIP.json). attn_dropout runs inside
            # the kernel (recomputed mask), so dropout-training configs keep
            # the O(L) memory path too
            if (self.mask and not record and L >= _FLASH_MIN_CTX
                    and q.dtype == jnp.bfloat16 and use_flash_attn()):
                from jukebox_tpu.ops.pallas.flash_attention import \
                    flash_dense_attn
                rate = self.attn_dropout if dropout_rng is not None else 0.0
                seed = (jax.random.randint(dropout_rng, (), 0, 2**31 - 1,
                                           dtype=jnp.int32)
                        if rate > 0.0 else None)
                return flash_dense_attn(q, k, v, self.n_head,
                                        dropout_rate=rate,
                                        dropout_seed=seed), None
            mask = "causal" if self.mask else None
            return dense_attn_(q, k, v, self.n_head, mask, record)
        if f == 1:
            bc = self.block_ctx
            mask = _causal_mask(bc, bc, 0) if self.mask else None
            qb = q.reshape(B * L // bc, bc, S)
            kb = k.reshape(B * L // bc, bc, S)
            vb = v.reshape(B * L // bc, bc, S)
            a, w = dense_attn_(qb, kb, vb, self.n_head, mask, record)
            return a.reshape(B, L, S), w
        if f == 2:
            bc = self.block_ctx
            nb = L // bc
            mask = _causal_mask(nb, nb, 0) if self.mask else None
            def t_(x):
                return (x.reshape(B, nb, bc, S).transpose(0, 2, 1, 3)
                        .reshape(B * bc, nb, S))
            a, w = dense_attn_(t_(q), t_(k), t_(v), self.n_head, mask, record)
            a = a.reshape(B, bc, nb, S).transpose(0, 2, 1, 3).reshape(B, L, S)
            return a, w
        if f == 3:
            bc = self.block_ctx
            nb = L // bc
            def shift(x):
                xb = x.reshape(B, nb, bc, S)
                return jnp.concatenate(
                    [jnp.zeros_like(xb[:, :1]), xb[:, :-1]], axis=1
                ).reshape(B * nb, bc, S)
            qb = q.reshape(B * nb, bc, S)
            a, w = dense_attn_(qb, shift(k), shift(v), self.n_head, None, record)
            return a.reshape(B, L, S), w
        if f in (4, 5):
            blocks = self.blocks
            bc = L // blocks
            spread = 1 if f == 4 else self.spread
            def summarize(x):
                xb = x.reshape(B, blocks, bc, S)[:, :-1, -spread:, :]
                xb = jnp.pad(xb, ((0, 0), (1, 0), (0, 0), (0, 0)))
                return xb.reshape(B, blocks * spread, S)
            mask = _summary_mask(L, blocks, spread) if self.mask else None
            return dense_attn_(q, summarize(k), summarize(v), self.n_head, mask, record)
        if f == 6:
            return dense_attn_(q, k, v, self.n_head, None, record)
        if f == 7:
            pl_ = self._prime_len
            mask = "causal" if self.mask else None  # tril over [Lq, prime]
            return dense_attn_(q, k[:, :pl_], v[:, :pl_], self.n_head, mask, record)
        raise NotImplementedError(f"attn_func {f}")

    # -- KV cache -------------------------------------------------------------

    def cache_len(self, sample_ctx=None):
        """Static cache size; matches the reference's maximal
        `_suff_cache_len` retention per pattern (:328-353)."""
        f = self.attn_func
        n = self.n_ctx if sample_ctx is None else sample_ctx
        if f == 0:
            return n
        if f == 1:
            return self.block_ctx
        if f == 2:
            return None  # stored as [bc, blocks]
        if f == 3:
            return 2 * self.block_ctx
        if f == 4:
            return self.blocks + 1  # zero pad + one summary per block
        if f == 5:
            raise NotImplementedError(
                "summary-spread sampling is not implemented (matches the "
                "reference, factored_attention.py:211)")
        if f == 6:
            return self.encoder_dims
        if f == 7:
            return self._prime_len
        raise NotImplementedError(f"attn_func {f} decode")

    def init_cache(self, params, bs, dtype, encoder_kv=None, sample_ctx=None):
        f = self.attn_func
        S = self.n_state
        if f == 6:
            kv = dense(params["c_enc_kv"], encoder_kv.astype(dtype))
            k, v = jnp.split(kv, 2, axis=2)
            return {"k": k, "v": v}
        if f == 2:
            shape = (bs, self.block_ctx, self.blocks, S)
        else:
            shape = (bs, self.cache_len(sample_ctx), S)
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}

    @staticmethod
    def _dus(buf, val, starts, g):
        """dynamic_update_slice with an optional leading group index g. When
        g is given, buf is group-stacked [G, ...] and the write lands at
        (g, *starts) — an in-place one-token update of the stacked buffer
        carried through the layer-group scan (no full-cache ys copy)."""
        if g is None:
            return lax.dynamic_update_slice(buf, val, starts)
        return lax.dynamic_update_slice(buf, val[None], (g, *starts))

    @staticmethod
    def _dsl(buf, starts, sizes, g):
        """dynamic_slice with an optional leading group index g."""
        if g is None:
            return lax.dynamic_slice(buf, starts, sizes)
        return lax.dynamic_slice(buf, (g, *starts), (1, *sizes))[0]

    def _group_view(self, buf, g):
        """The [B, ...] cache of group g from a stacked [G, B, ...] buffer
        (identity when g is None)."""
        if g is None:
            return buf
        return self._dsl(buf, (0,) * (buf.ndim - 1), buf.shape[1:], g)

    def _write_token(self, cache, k, v, t, g=None):
        """Write one token's K/V (k,v: [B, 1, S]) at position t. With g, the
        cache leaves are group-stacked [G, ...] and the write is an in-place
        update at group g."""
        f = self.attn_func
        bc = self.block_ctx if self.blocks else None
        if f == 0:
            return {"k": self._dus(cache["k"], k, (0, t, 0), g),
                    "v": self._dus(cache["v"], v, (0, t, 0), g)}
        if f == 1:
            s = t % bc
            return {"k": self._dus(cache["k"], k, (0, s, 0), g),
                    "v": self._dus(cache["v"], v, (0, s, 0), g)}
        if f == 2:
            c, b = t % bc, t // bc
            k4 = k[:, :, None, :]
            v4 = v[:, :, None, :]
            return {"k": self._dus(cache["k"], k4, (0, c, b, 0), g),
                    "v": self._dus(cache["v"], v4, (0, c, b, 0), g)}
        if f == 3:
            ring, c = (t // bc) % 2, t % bc
            start = ring * bc + c
            return {"k": self._dus(cache["k"], k, (0, start, 0), g),
                    "v": self._dus(cache["v"], v, (0, start, 0), g)}
        if f == 4:
            # only block-final tokens become summaries; slot 0 stays the
            # zero pad (summary_attn sample path, factored_attention.py:198-201)
            is_last = (t % bc) == (bc - 1)
            idx = jnp.where(is_last, 1 + t // bc, self.blocks + 2)
            if g is None:
                return {"k": cache["k"].at[:, idx].set(k[:, 0], mode="drop"),
                        "v": cache["v"].at[:, idx].set(v[:, 0], mode="drop")}
            return {"k": cache["k"].at[g, :, idx].set(k[:, 0], mode="drop"),
                    "v": cache["v"].at[g, :, idx].set(v[:, 0], mode="drop")}
        if f == 6:
            return cache
        if f == 7:
            pl_ = self._prime_len
            idx = jnp.where(t < pl_, t, pl_ + 1)  # out-of-range -> dropped
            if g is None:
                return {"k": cache["k"].at[:, idx].set(k[:, 0], mode="drop"),
                        "v": cache["v"].at[:, idx].set(v[:, 0], mode="drop")}
            return {"k": cache["k"].at[g, :, idx].set(k[:, 0], mode="drop"),
                    "v": cache["v"].at[g, :, idx].set(v[:, 0], mode="drop")}
        raise NotImplementedError(f"attn_func {f} decode")

    def decode_step(self, params, cache, x, t, encoder_kv=None, g=None):
        """One-token incremental decode. x: [B, 1, n_in], t: traced scalar
        position. Returns (out [B, 1, n_in], cache).

        g: optional traced group index — cache leaves are group-stacked
        [G, ...] buffers carried through the layer-group scan; reads slice
        out only what the pattern attends to and writes update one token in
        place (the alternative — streaming caches through scan xs/ys — copies
        every cache in full every token)."""
        f = self.attn_func
        B = x.shape[0]
        S = self.n_state
        if f == 6:
            # encoder K/V were projected once in init_cache; only the query
            # is computed per token (the reference caches them the same way,
            # factored_attention.py:246-253)
            q = dense(params["c_attn"], x)
            a, _ = dense_attn(q, self._group_view(cache["k"], g),
                              self._group_view(cache["v"], g), self.n_head, None)
            return dense(params["c_proj"], a), cache
        q, k, v = self._qkv(params, x, None)
        cache = self._write_token(cache, k, v, t, g)
        bc = self.block_ctx if self.blocks else None

        if f == 0:
            L = cache["k"].shape[-2]
            slots = jnp.arange(L)[None, :]
            mask = (slots <= t).astype(jnp.float32)
            a, _ = dense_attn(q, self._group_view(cache["k"], g),
                              self._group_view(cache["v"], g), self.n_head, mask)
        elif f == 1:
            slots = jnp.arange(bc)[None, :]
            mask = (slots <= t % bc).astype(jnp.float32)
            a, _ = dense_attn(q, self._group_view(cache["k"], g),
                              self._group_view(cache["v"], g), self.n_head, mask)
        elif f == 2:
            c = t % bc
            kr = self._dsl(cache["k"], (0, c, 0, 0), (B, 1, self.blocks, S),
                           g)[:, 0]
            vr = self._dsl(cache["v"], (0, c, 0, 0), (B, 1, self.blocks, S),
                           g)[:, 0]
            slots = jnp.arange(self.blocks)[None, :]
            mask = (slots <= t // bc).astype(jnp.float32)
            a, _ = dense_attn(q, kr, vr, self.n_head, mask)
        elif f == 3:
            prev_ring = ((t // bc) - 1) % 2
            kr = self._dsl(cache["k"], (0, prev_ring * bc, 0), (B, bc, S), g)
            vr = self._dsl(cache["v"], (0, prev_ring * bc, 0), (B, bc, S), g)
            # first block: ring slot 1 is still zeros -> uniform attn over
            # zero values = 0, same as the reference's zero K/V (:179-181)
            a, _ = dense_attn(q, kr, vr, self.n_head, None)
        elif f == 4:
            # attend the zero pad + summaries of completed blocks; the final
            # block's summary is never attendable (reference strides stop at
            # blocks*bc-1, factored_attention.py:199)
            slots = jnp.arange(self.blocks + 1)[None, :]
            hi = jnp.minimum((t + 1) // bc, self.blocks - 1)
            mask = (slots <= hi).astype(jnp.float32)
            a, _ = dense_attn(q, self._group_view(cache["k"], g),
                              self._group_view(cache["v"], g), self.n_head, mask)
        elif f == 7:
            pl_ = self._prime_len
            slots = jnp.arange(pl_)[None, :]
            mask = (slots <= jnp.minimum(t, pl_ - 1)).astype(jnp.float32)
            a, _ = dense_attn(q, self._group_view(cache["k"], g),
                              self._group_view(cache["v"], g), self.n_head, mask)
        else:
            raise NotImplementedError(f"attn_func {f} decode")

        return dense(params["c_proj"], a), cache

    # -- chunked prefill ------------------------------------------------------

    def prefill_chunk(self, params, cache, x, t0, n_blocks, encoder_kv=None,
                      g=None, kernel_cache=False):
        """Prefill the cache with a block-aligned chunk.

        x: [B, C, n_in] with C = n_blocks * block_ctx (or arbitrary C for
        funcs 0/6/7); t0: traced start position, multiple of block_ctx.
        Returns (out [B, C, n_in], cache). g: optional group index into
        stacked [G, ...] cache buffers (see decode_step).

        kernel_cache=True: the cache leaves are in the decode megakernel's
        slot-leading lane-padded layout (ops/pallas/decode_stack) and the
        prefill writes/reads them DIRECTLY — no standard-layout copy ever
        exists, so the per-window prefill->decode conversion (whose
        source+target transient capped hop batch sizes) disappears.
        Supported for funcs 0/1/2/3/6/7 (the packed-segment funcs);
        g required.
        """
        f = self.attn_func
        if kernel_cache:
            return self._prefill_chunk_kernel(params, cache, x, t0,
                                              n_blocks, g)
        if f == 6:
            q = dense(params["c_attn"], x)
            a, _ = dense_attn(q, self._group_view(cache["k"], g),
                              self._group_view(cache["v"], g), self.n_head, None)
            return dense(params["c_proj"], a), cache
        q, k, v = self._qkv(params, x, None)
        B, C, S = v.shape
        bc = self.block_ctx if self.blocks else None

        if f == 0:
            cache = {"k": self._dus(cache["k"], k, (0, t0, 0), g),
                     "v": self._dus(cache["v"], v, (0, t0, 0), g)}
            L = cache["k"].shape[-2]
            mask = (jnp.arange(L)[None, :] <= (t0 + jnp.arange(C))[:, None])
            a, _ = dense_attn(q, self._group_view(cache["k"], g),
                              self._group_view(cache["v"], g), self.n_head,
                              mask.astype(jnp.float32))
        elif f == 1:
            assert C == n_blocks * bc
            mask = _causal_mask(bc, bc, 0)
            qb = q.reshape(B * n_blocks, bc, S)
            kb = k.reshape(B * n_blocks, bc, S)
            vb = v.reshape(B * n_blocks, bc, S)
            a, _ = dense_attn(qb, kb, vb, self.n_head, mask)
            a = a.reshape(B, C, S)
            # only the final block's K/V matters for future steps
            if g is None:
                cache = {"k": k[:, -bc:], "v": v[:, -bc:]}
            else:
                cache = {"k": self._dus(cache["k"], k[:, -bc:], (0, 0, 0), g),
                         "v": self._dus(cache["v"], v[:, -bc:], (0, 0, 0), g)}
        elif f == 2:
            assert C == n_blocks * bc
            b0 = t0 // bc
            # write chunk columns into [bc, blocks] layout
            kcol = k.reshape(B, n_blocks, bc, S).transpose(0, 2, 1, 3)
            vcol = v.reshape(B, n_blocks, bc, S).transpose(0, 2, 1, 3)
            cache = {"k": self._dus(cache["k"], kcol, (0, 0, b0, 0), g),
                     "v": self._dus(cache["v"], vcol, (0, 0, b0, 0), g)}
            # query (local block j, column c) attends cache[c, :b0+j+1]
            qc = q.reshape(B, n_blocks, bc, S).transpose(0, 2, 1, 3)  # [B, bc, nb, S]
            mask = (jnp.arange(self.blocks)[None, :]
                    <= (b0 + jnp.arange(n_blocks))[:, None])  # [nb, blocks]
            qh = qc.reshape(B * bc, n_blocks, S)
            kh = self._group_view(cache["k"], g).reshape(B * bc, self.blocks, S)
            vh = self._group_view(cache["v"], g).reshape(B * bc, self.blocks, S)
            a, _ = dense_attn(qh, kh, vh, self.n_head, mask.astype(jnp.float32))
            a = (a.reshape(B, bc, n_blocks, S).transpose(0, 2, 1, 3)
                 .reshape(B, C, S))
        elif f == 3:
            assert C == n_blocks * bc
            b0 = t0 // bc
            prev_ring = (b0 - 1) % 2
            prev_k = self._dsl(cache["k"], (0, prev_ring * bc, 0), (B, bc, S), g)
            prev_v = self._dsl(cache["v"], (0, prev_ring * bc, 0), (B, bc, S), g)
            kb = k.reshape(B, n_blocks, bc, S)
            vb = v.reshape(B, n_blocks, bc, S)
            k_shift = jnp.concatenate([prev_k[:, None], kb[:, :-1]], axis=1)
            v_shift = jnp.concatenate([prev_v[:, None], vb[:, :-1]], axis=1)
            a, _ = dense_attn(q.reshape(B * n_blocks, bc, S),
                              k_shift.reshape(B * n_blocks, bc, S),
                              v_shift.reshape(B * n_blocks, bc, S),
                              self.n_head, None)
            a = a.reshape(B, C, S)
            # maintain the double buffer: write the chunk's last two blocks
            last_ring = (b0 + n_blocks - 1) % 2
            cache = {"k": self._dus(cache["k"], kb[:, -1], (0, last_ring * bc, 0), g),
                     "v": self._dus(cache["v"], vb[:, -1], (0, last_ring * bc, 0), g)}
            if n_blocks >= 2:
                other = (b0 + n_blocks - 2) % 2
                cache = {"k": self._dus(cache["k"], kb[:, -2], (0, other * bc, 0), g),
                         "v": self._dus(cache["v"], vb[:, -2], (0, other * bc, 0), g)}
        elif f == 4:
            assert C == n_blocks * bc
            b0 = t0 // bc
            # write each chunk block's final position as its summary
            kb = k.reshape(B, n_blocks, bc, S)[:, :, -1]  # [B, nb, S]
            vb = v.reshape(B, n_blocks, bc, S)[:, :, -1]
            cache = {"k": self._dus(cache["k"], kb, (0, 1 + b0, 0), g),
                     "v": self._dus(cache["v"], vb, (0, 1 + b0, 0), g)}
            # query at (local block j, col c) attends pad + summaries of
            # blocks < b0+j, plus its own summary at the block-final position
            pos = t0 + jnp.arange(C)
            hi = jnp.minimum((pos + 1) // bc, self.blocks - 1)
            mask = (jnp.arange(self.blocks + 1)[None, :]
                    <= hi[:, None]).astype(jnp.float32)
            a, _ = dense_attn(q, self._group_view(cache["k"], g),
                              self._group_view(cache["v"], g), self.n_head, mask)
        elif f == 7:
            pl_ = self._prime_len
            pos = t0 + jnp.arange(C)
            idx = jnp.where(pos < pl_, pos, pl_ + 1)
            if g is None:
                cache = {"k": cache["k"].at[:, idx].set(k, mode="drop"),
                         "v": cache["v"].at[:, idx].set(v, mode="drop")}
                kg, vg = cache["k"], cache["v"]
            else:
                # read-modify-write of group g's [B, pl, S] slice: an array
                # advanced index mixed with a scalar g would scatter through
                # an awkward transposed layout; the slice is small (prime
                # cache only) and prefill runs once per chunk
                kg = self._group_view(cache["k"], g).at[:, idx].set(k, mode="drop")
                vg = self._group_view(cache["v"], g).at[:, idx].set(v, mode="drop")
                cache = {"k": self._dus(cache["k"], kg, (0, 0, 0), g),
                         "v": self._dus(cache["v"], vg, (0, 0, 0), g)}
            mask = (jnp.arange(pl_)[None, :] <= jnp.minimum(pos, pl_ - 1)[:, None])
            a, _ = dense_attn(q, kg, vg, self.n_head,
                              mask.astype(jnp.float32))
        else:
            raise NotImplementedError(f"attn_func {f} prefill")

        return dense(params["c_proj"], a), cache

    def _prefill_chunk_kernel(self, params, cache, x, t0, n_blocks, g):
        """prefill_chunk against megakernel-layout caches (slot-leading,
        lane-padded; see ops/pallas/decode_stack docstring):
          f1 [G, bc, B, Ap]   f2 [G, bc, blocks, B, Ap]
          f3 [G, 2, bc, B, Ap]   f6 [G, enc, B, Ap] (read-only)
        Chunk K/V transpose before the write (a few MB); cache READS stay
        in the slot-leading layout via _slot_leading_attn — XLA folds the
        layout into the dots, so no multi-GB transposed copy is created.

        int8 caches (the dict carries "ks"/"vs" per-row scale buffers,
        [..., B, SCALE_LANES] bf16 with the value in lane 0): writes
        quantise rows in place, reads dequantise the slice being attended —
        the full cache never exists in bf16, so the int8 capacity win holds
        through the prefill too."""
        f = self.attn_func
        assert g is not None, "kernel_cache prefill is group-scanned"
        quant = "ks" in cache
        Ap = cache["k"].shape[-1]
        Bc = cache["k"].shape[-2]  # may carry Mosaic sublane batch padding
        Bx = x.shape[0]

        def dq(c, s, dtype):
            """Dequantise an int8 cache slice with its [..., B, lanes]
            scale rows (lane 0 holds the value)."""
            return (c.astype(jnp.float32)
                    * s[..., :1].astype(jnp.float32)).astype(dtype)

        def view(key, gg, b, a):
            """Group view of cache[key], dequantised when int8."""
            c = self._group_view(cache[key], gg)[..., :b, :a]
            if not quant:
                return c
            s = self._group_view(cache[key[0] + "s"], gg)[..., :b, :]
            return dq(c, s, x.dtype)

        if f == 6:
            q = dense(params["c_attn"], x)
            A = q.shape[-1]
            kg = view("k", g, Bx, A)
            vg = view("v", g, Bx, A)
            a = _slot_leading_attn(q, kg, vg, self.n_head, None)
            return dense(params["c_proj"], a), cache

        q, k, v = self._qkv(params, x, None)
        B, C, S = v.shape
        bc = self.block_ctx

        def padA(t):  # [..., B, S] -> [..., Bc, Ap] (lane + sublane pads)
            widths = [(0, 0)] * t.ndim
            widths[-1] = (0, Ap - t.shape[-1])
            widths[-2] = (0, Bc - B)
            if t.shape[-1] == Ap and Bc == B:
                return t
            return jnp.pad(t, widths)

        from jukebox_tpu.ops.pallas.decode_stack import SCALE_LANES

        def store(traw):
            """Transposed pre-pad rows [..., B, S] -> padded buffer values
            for the cache write: (k-or-v buffer, scale buffer or None)."""
            if not quant:
                return padA(traw), None
            tf = traw.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(tf), axis=-1, keepdims=True)
                            / 127.0, 1e-8)
            qv = jnp.clip(jnp.round(tf / s), -127.0, 127.0).astype(jnp.int8)
            widths = [(0, 0)] * s.ndim
            widths[-1] = (0, SCALE_LANES - 1)
            widths[-2] = (0, Bc - B)
            return padA(qv), jnp.pad(s.astype(jnp.bfloat16), widths)

        def put(cc, key, traw, starts, gg):
            """Write transposed rows (quantising when int8) at starts."""
            val, sval = store(traw)
            cc = dict(cc)
            cc[key] = self._dus(cc[key], val, starts, gg)
            if sval is not None:
                cc[key + "s"] = self._dus(cc[key + "s"], sval, starts, gg)
            return cc

        if f == 1:
            assert C == n_blocks * bc
            mask = _causal_mask(bc, bc, 0)
            a, _ = dense_attn(q.reshape(B * n_blocks, bc, S),
                              k.reshape(B * n_blocks, bc, S),
                              v.reshape(B * n_blocks, bc, S),
                              self.n_head, mask)
            a = a.reshape(B, C, S)
            # only the final block's K/V matters: [B, bc, S] -> [bc, B, Ap]
            cache = put(cache, "k", jnp.transpose(k[:, -bc:], (1, 0, 2)),
                        (0, 0, 0), g)
            cache = put(cache, "v", jnp.transpose(v[:, -bc:], (1, 0, 2)),
                        (0, 0, 0), g)
        elif f == 2:
            assert C == n_blocks * bc
            b0 = t0 // bc
            # chunk columns [B, nb, bc, S] -> [bc, nb, B, Ap], write at b0
            cache = put(cache, "k",
                        jnp.transpose(k.reshape(B, n_blocks, bc, S),
                                      (2, 1, 0, 3)), (0, b0, 0, 0), g)
            cache = put(cache, "v",
                        jnp.transpose(v.reshape(B, n_blocks, bc, S),
                                      (2, 1, 0, 3)), (0, b0, 0, 0), g)
            # query (local block j, column c) attends cache[c, :b0+j+1]:
            # batch the bc columns through the head axis of
            # _slot_leading_attn? No — fold c into the batch dim instead.
            kg = view("k", g, B, S)
            vg = view("v", g, B, S)
            qc = jnp.transpose(q.reshape(B, n_blocks, bc, S), (0, 2, 1, 3))
            hd = S // self.n_head
            scale = jnp.asarray(1.0 / math.sqrt(math.sqrt(hd)), q.dtype)
            qh = qc.reshape(B, bc, n_blocks, self.n_head, hd) * scale
            kh = kg.reshape(bc, self.blocks, B, self.n_head, hd) \
                * scale.astype(kg.dtype)
            vh = vg.reshape(bc, self.blocks, B, self.n_head, hd)
            w = jnp.einsum("bcjhd,clbhd->bchjl", qh, kh,
                           precision=_prec(q.dtype),
                           preferred_element_type=jnp.float32)
            mask = (jnp.arange(self.blocks)[None, :]
                    <= (b0 + jnp.arange(n_blocks))[:, None]).astype(jnp.float32)
            w = w * mask + NEG * (1 - mask)
            w = jax.nn.softmax(w, axis=-1)
            a = jnp.einsum("bchjl,clbhd->bcjhd", w.astype(q.dtype), vh,
                           precision=_prec(q.dtype),
                           preferred_element_type=q.dtype)
            a = (a.reshape(B, bc, n_blocks, S).transpose(0, 2, 1, 3)
                 .reshape(B, C, S))
        elif f == 3:
            assert C == n_blocks * bc
            b0 = t0 // bc
            prev_ring = (b0 - 1) % 2
            # previous block from the ring: [bc, B, Ap] -> [B, bc, S]
            B3 = cache["k"].shape[3]

            def prev(key):
                p = self._dsl(cache[key], (prev_ring, 0, 0, 0),
                              (1, bc, B3, Ap), g)[0]
                if quant:
                    s = self._dsl(cache[key + "s"], (prev_ring, 0, 0, 0),
                                  (1, bc, B3, cache[key + "s"].shape[-1]),
                                  g)[0]
                    p = dq(p, s, x.dtype)
                return jnp.transpose(p[:, :B, :S], (1, 0, 2))

            prev_k, prev_v = prev("k"), prev("v")
            kb = k.reshape(B, n_blocks, bc, S)
            vb = v.reshape(B, n_blocks, bc, S)
            k_shift = jnp.concatenate([prev_k[:, None], kb[:, :-1]], axis=1)
            v_shift = jnp.concatenate([prev_v[:, None], vb[:, :-1]], axis=1)
            a, _ = dense_attn(q.reshape(B * n_blocks, bc, S),
                              k_shift.reshape(B * n_blocks, bc, S),
                              v_shift.reshape(B * n_blocks, bc, S),
                              self.n_head, None)
            a = a.reshape(B, C, S)
            # maintain the double buffer: the chunk's last two blocks
            last_ring = (b0 + n_blocks - 1) % 2
            cache = put(cache, "k",
                        jnp.transpose(kb[:, -1], (1, 0, 2))[None],
                        (last_ring, 0, 0, 0), g)
            cache = put(cache, "v",
                        jnp.transpose(vb[:, -1], (1, 0, 2))[None],
                        (last_ring, 0, 0, 0), g)
            if n_blocks >= 2:
                other = (b0 + n_blocks - 2) % 2
                cache = put(cache, "k",
                            jnp.transpose(kb[:, -2], (1, 0, 2))[None],
                            (other, 0, 0, 0), g)
                cache = put(cache, "v",
                            jnp.transpose(vb[:, -2], (1, 0, 2))[None],
                            (other, 0, 0, 0), g)
        elif f == 7:
            # prime cache [G, _prime_len + 1, Bc, Ap]: rows < _prime_len are
            # the lyric prefix, the last row is the gen-phase garbage slot
            pl_ = self._prime_len
            pos = t0 + jnp.arange(C)
            idx = jnp.where(pos < pl_, pos, pl_)   # overflow -> garbage row

            def set_rows(key, traw):
                # scatter the chunk's rows at idx into group g's view (and
                # their scale rows when int8); returns the dequantised
                # updated view for the attention read
                val, sval = store(jnp.transpose(traw, (1, 0, 2)))
                gv = self._group_view(cache[key], g).at[idx].set(val)
                upd = {key: self._dus(cache[key], gv, (0, 0, 0), g)}
                if sval is None:
                    return gv, upd
                gs = self._group_view(cache[key + "s"], g).at[idx].set(sval)
                upd[key + "s"] = self._dus(cache[key + "s"], gs,
                                           (0, 0, 0), g)
                return dq(gv, gs, x.dtype), upd

            kg, k_upd = set_rows("k", k)
            vg, v_upd = set_rows("v", v)
            cache = {**cache, **k_upd, **v_upd}
            mask = (jnp.arange(pl_)[None, :]
                    <= jnp.minimum(pos, pl_ - 1)[:, None]).astype(jnp.float32)
            a = _slot_leading_attn(q, kg[:pl_, :B, :S], vg[:pl_, :B, :S],
                                   self.n_head, mask)
        elif f == 0:
            # full-context ring [G, rows(chunk-padded), Bc, Ap]
            cache = put(cache, "k", jnp.transpose(k, (1, 0, 2)),
                        (t0, 0, 0), g)
            cache = put(cache, "v", jnp.transpose(v, (1, 0, 2)),
                        (t0, 0, 0), g)
            rows = cache["k"].shape[1]  # g is asserted non-None above
            kg = view("k", g, B, S)
            vg = view("v", g, B, S)
            pos = t0 + jnp.arange(C)
            mask = (jnp.arange(rows)[None, :]
                    <= pos[:, None]).astype(jnp.float32)
            a = _slot_leading_attn(q, kg, vg, self.n_head, mask)
        else:
            raise NotImplementedError(f"attn_func {f} kernel-cache prefill")

        return dense(params["c_proj"], a), cache
