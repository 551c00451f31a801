"""Conditional autoregressive transformer over VQ codes — TPU equivalent of
jukebox/prior/autoregressive.py.

Teacher-forced forward: shift-by-one with the start token replaced by the
y-conditioning embedding (autoregressive.py:116-175). Token decoding is a
`lax.scan` over positions with static ring KV caches and on-device
temp/top-k/top-p categorical sampling — replacing the reference's Python
token loop (:199-249) and chunked cache prefill (:251-359).
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from jukebox_tpu.models.transformer import Transformer
from jukebox_tpu.ops.core import dense_init, filter_logits
from jukebox_tpu.ops.core import dropout as ops_dropout

LN2 = float(np.log(2.0))


def cross_entropy_bpd(logits, targets):
    """Mean cross-entropy in bits-per-dim (reference divides by ln 2,
    autoregressive.py:163-168)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll) / LN2


@dataclass(frozen=True)
class ConditionalAutoregressive2D:
    input_shape: Tuple[int, ...]
    bins: int
    width: int = 128
    depth: int = 2
    heads: int = 1
    attn_order: int = 0
    blocks: Optional[int] = None
    spread: Optional[int] = None
    m_attn: float = 0.25
    m_mlp: float = 1.0
    zero_out: bool = False
    init_scale: float = 1.0
    res_scale: bool = False
    pos_init: bool = False
    x_cond: bool = False
    y_cond: bool = False
    encoder_dims: int = 0
    only_encode: bool = False
    merged_decoder: bool = False
    prime_len: Optional[int] = None
    mask: bool = True
    checkpoint_res: int = 0
    checkpoint_attn: int = 0
    checkpoint_mlp: int = 0
    attn_dropout: float = 0.0
    resid_dropout: float = 0.0
    emb_dropout: float = 0.0

    @property
    def input_dims(self):
        return int(np.prod(self.input_shape))

    @property
    def add_cond_after_transformer(self):
        # merged piped 5b checkpoints depend on this (autoregressive.py:87-93)
        return not self.merged_decoder

    @property
    def share_x_emb_x_out(self):
        return not self.merged_decoder

    @property
    def transformer(self):
        return Transformer(
            n_in=self.width, n_ctx=self.input_dims, n_head=self.heads,
            n_depth=self.depth, attn_order=self.attn_order, blocks=self.blocks,
            spread=self.spread, encoder_dims=self.encoder_dims,
            prime_len=self.prime_len, m_attn=self.m_attn, m_mlp=self.m_mlp,
            mask=self.mask, zero_out=self.zero_out, init_scale=self.init_scale,
            res_scale=self.res_scale, afn="quick_gelu",
            checkpoint_attn=self.checkpoint_attn, checkpoint_mlp=self.checkpoint_mlp,
            checkpoint_res=self.checkpoint_res,
            attn_dropout=self.attn_dropout, resid_dropout=self.resid_dropout)

    @property
    def block_ctx(self):
        return self.input_dims // self.blocks if self.blocks else None

    # -- params ---------------------------------------------------------------

    def init(self, rng):
        r_emb, r_pos, r_start, r_tr, r_out = jax.random.split(rng, 5)
        assert not self.pos_init, "pos_init embeddings are unused by all released models"
        params = {
            "x_emb": {"weight": 0.02 * self.init_scale * jax.random.normal(
                r_emb, (self.bins, self.width), dtype=jnp.float32)},
            "pos_emb": {"pos_emb": 0.01 * self.init_scale * jax.random.normal(
                r_pos, (self.input_dims, self.width), dtype=jnp.float32)},
            "transformer": self.transformer.init(r_tr),
        }
        if not self.y_cond:
            params["start_token"] = 0.01 * self.init_scale * jax.random.normal(
                r_start, (1, self.width), dtype=jnp.float32)
        if not self.only_encode and not self.share_x_emb_x_out:
            bound = 1.0 / np.sqrt(self.width)
            params["x_out"] = {"w": jax.random.uniform(
                r_out, (self.width, self.bins), minval=-bound, maxval=bound,
                dtype=jnp.float32)}
        return params

    def _x_out_w(self, params):
        if self.share_x_emb_x_out:
            return params["x_emb"]["weight"].T
        return params["x_out"]["w"]

    def _logits(self, params, h):
        w = self._x_out_w(params).astype(jnp.float32)
        return jnp.dot(h.astype(jnp.float32), w,
                       precision=lax.Precision.HIGHEST)

    def _start_emb(self, params, y_cond, n):
        if self.y_cond:
            assert y_cond is not None
            return y_cond.reshape(n, 1, self.width)
        return jnp.broadcast_to(params["start_token"][None], (n, 1, self.width))

    def _default_x_cond(self, n, dtype=jnp.float32):
        return jnp.zeros((n, 1, self.width), dtype)

    # -- teacher-forced forward (autoregressive.py:116-175) -------------------

    def forward(self, params, x, x_cond=None, y_cond=None, encoder_kv=None,
                fp16=False, get_preds=False, get_acts=False, get_sep_loss=False,
                record_layers=frozenset(), dropout_rng=None):
        N, D = x.shape
        assert D == self.input_dims
        if self.x_cond:
            assert x_cond is not None
        else:
            assert x_cond is None
            x_cond = self._default_x_cond(N)

        x_t = x
        emb = jnp.take(params["x_emb"]["weight"], x, axis=0)
        # shift right by one; position 0 becomes start/y_cond embedding
        emb = jnp.concatenate([self._start_emb(params, y_cond, N), emb[:, :-1]], axis=1)
        pos = params["pos_emb"]["pos_emb"][None]
        r_tr = None
        if dropout_rng is not None and self.emb_dropout > 0.0:
            # separate token/pos embedding dropout (reference :147)
            r_emb, r_pos, r_tr = jax.random.split(dropout_rng, 3)
            emb = ops_dropout(emb, self.emb_dropout, r_emb)
            pos = ops_dropout(jnp.broadcast_to(pos, (N, *pos.shape[1:])),
                              self.emb_dropout, r_pos)
        elif dropout_rng is not None:
            r_tr = dropout_rng
        h = emb + pos + x_cond

        h, ws = self.transformer.apply(params["transformer"], h,
                                       encoder_kv=encoder_kv, fp16=fp16,
                                       record_layers=record_layers,
                                       dropout_rng=r_tr)
        if self.add_cond_after_transformer:
            h = h + x_cond

        acts = h
        if self.only_encode:
            return h if not record_layers else (h, ws)
        logits = self._logits(params, h)

        if get_sep_loss:
            assert self.prime_len is not None
            prime_loss = cross_entropy_bpd(logits[:, :self.prime_len],
                                           x_t[:, :self.prime_len])
            gen_loss = cross_entropy_bpd(logits[:, self.prime_len:],
                                         x_t[:, self.prime_len:])
            loss = (prime_loss, gen_loss)
        else:
            loss = cross_entropy_bpd(logits, x_t)

        extra = None
        if get_preds:
            extra = logits
        elif get_acts:
            extra = acts
        if record_layers:
            return loss, extra, ws
        return loss, extra

    # -- incremental decoding pieces ------------------------------------------

    def _emb_at(self, params, t, x_tok, x_cond, y_cond, n):
        """Input embedding at position t given previous token x_tok [N, 1]
        (reference get_emb, autoregressive.py:177-197)."""
        tok_emb = jnp.take(params["x_emb"]["weight"], x_tok, axis=0)  # [N,1,W]
        start = self._start_emb(params, y_cond, n)
        emb = jnp.where(t == 0, start, tok_emb)
        if x_cond.shape[1] > 1:
            # x_cond may be batch-collapsed to [1, T, W] when every sample
            # shares the same labels (sample_init cond_bs1) — slice by its
            # own batch dim and let the add broadcast over the N samples
            cond = lax.dynamic_slice(x_cond, (0, t, 0),
                                     (x_cond.shape[0], 1, self.width))
        else:
            cond = x_cond
        pos = lax.dynamic_slice(params["pos_emb"]["pos_emb"], (t, 0), (1, self.width))
        return emb + pos[None] + cond, cond

    def _decode_one(self, params, dec_params, caches, x_tok, t, x_cond, y_cond,
                    encoder_kv, fp16, n):
        h, cond = self._emb_at(params, t, x_tok, x_cond, y_cond, n)
        h, caches = self.transformer.decode_step(dec_params, caches, h, t,
                                                 encoder_kv=encoder_kv, fp16=fp16)
        if self.add_cond_after_transformer:
            h = h + cond
        return self._logits(params, h), caches

    def _sample_tok(self, logits, rng, temp, top_k, top_p):
        logits = logits.astype(jnp.float32)
        if temp == 0.0:
            return jnp.argmax(logits, axis=-1)
        logits = logits / temp
        logits = filter_logits(logits, top_k=top_k, top_p=top_p)
        return jax.random.categorical(rng, logits, axis=-1)

    # -- segmented decoding ----------------------------------------------------
    # The token scan can be split into fixed-size segments with the caches as
    # carried state: one compiled segment graph is reused for the whole
    # window (and across windows), each device call stays short (important on
    # preemptible/remote device transports), and sampling becomes resumable.
    # fold_in(rng, absolute_t) makes the segmented stream token-identical to
    # the monolithic scan.

    def sample_segment(self, params, caches, x_tok, t0, n_steps, rng,
                       x_cond=None, y_cond=None, encoder_kv=None, fp16=False,
                       temp=1.0, top_k=0, top_p=0.0, dec_params=None):
        """Decode `n_steps` (static) tokens starting at traced position t0.
        x_tok: [N, 1] previous token (ignored at t=0 where the start/y_cond
        embedding is used). Returns (tokens [N, n_steps], caches, x_tok).
        dec_params: pre-staged segment-shaped transformer params (zero-copy
        staging); derived from params["transformer"] when absent."""
        N = x_tok.shape[0]
        if not self.x_cond:
            assert x_cond is None
            x_cond = self._default_x_cond(N)
        if dec_params is None:
            dec_params = self.transformer.prepare_decode_params(params["transformer"])

        def step(carry, t):
            caches, x_tok, rng = carry
            logits, caches = self._decode_one(params, dec_params, caches, x_tok,
                                              t, x_cond, y_cond, encoder_kv,
                                              fp16, N)
            tok = self._sample_tok(logits, jax.random.fold_in(rng, t), temp,
                                   top_k, top_p)
            return (caches, tok, rng), tok

        (caches, x_tok, _), toks = lax.scan(
            step, (caches, x_tok, rng), t0 + jnp.arange(n_steps))
        return toks[:, :, 0].T, caches, x_tok

    def init_decode_caches(self, params, n_samples, fp16=False,
                           encoder_kv=None, dec_params=None):
        dtype = jnp.bfloat16 if fp16 else jnp.float32
        if dec_params is not None:
            return self.transformer.init_cache_from_segments(
                dec_params, n_samples, dtype, encoder_kv=encoder_kv)
        return self.transformer.init_cache(params["transformer"], n_samples,
                                           dtype, encoder_kv=encoder_kv)

    def prefill(self, params, caches, x_prime, x_cond=None, y_cond=None,
                encoder_kv=None, fp16=False, chunk_size=None, dec_params=None,
                prefill_mb=None):
        """Fill `caches` with positions [0, P) from x_prime [N, P] (the
        prefill half of primed_sample). Returns (caches, x_tok) ready for
        sample_segment at t0=P.

        prefill_mb: optional sample-axis microbatch — prefill `prefill_mb`
        samples at a time, scattering each sub-batch's K/V into the full
        caches. Bounds the prefill transients (h_in + per-chunk
        activations scale with the sub-batch, not N), which is what capped
        hop windows at bs=16 on a 16 GB chip (PERF.md serving mode); the
        reference's max_batch_size split (sample.py:60-73) applied at the
        prefill level."""
        N, P = x_prime.shape
        if not self.x_cond:
            assert x_cond is None
            x_cond = self._default_x_cond(N)
        if dec_params is None:
            dec_params = self.transformer.prepare_decode_params(params["transformer"])
        if prefill_mb is not None and prefill_mb < N:
            mb = int(prefill_mb)
            while N % mb:  # static shapes need equal slices
                mb -= 1
            axes = self.transformer.cache_batch_axes(caches)

            def slice_in(x, i):
                if x is None or x.shape[0] != N:
                    return x
                return lax.dynamic_slice_in_dim(x, i * mb, mb, 0)

            def body(caches, i):
                sub = jax.tree_util.tree_map(
                    lambda c, a: lax.dynamic_slice_in_dim(c, i * mb, mb, a),
                    caches, axes)
                sub = self._run_prefill(
                    params, dec_params, sub, slice_in(x_prime, i),
                    slice_in(x_cond, i), slice_in(y_cond, i),
                    slice_in(encoder_kv, i), fp16, chunk_size)[0]
                caches = jax.tree_util.tree_map(
                    lambda c, s, a: lax.dynamic_update_slice_in_dim(
                        c, s, i * mb, a), caches, sub, axes)
                return caches, ()

            caches, _ = lax.scan(body, caches, jnp.arange(N // mb))
        else:
            caches = self._run_prefill(params, dec_params, caches, x_prime,
                                       x_cond, y_cond, encoder_kv, fp16,
                                       chunk_size)[0]
        return caches, x_prime[:, -1:].astype(jnp.int32)

    def _run_prefill(self, params, dec_params, caches, x_prime, x_cond, y_cond,
                     encoder_kv, fp16, chunk_size, get_preds=False):
        """Block-aligned chunked prefill + single-token tail (shared by
        primed_sample and prefill)."""
        N, P = x_prime.shape
        x_cond_full = x_cond.shape[1] > 1
        # build the prefill activations directly in the transformer's compute
        # dtype: the fp32 [N, P, width] h_in transient is ~0.8 GB at
        # bs=24/1b-upsampler scale and is what capped hop windows at bs=16
        # (the decode loop already does these adds in bf16 via _emb_at)
        dtype = jnp.bfloat16 if fp16 else jnp.float32
        emb_in = jnp.take(params["x_emb"]["weight"], x_prime[:, :-1],
                          axis=0).astype(dtype)
        emb_in = jnp.concatenate(
            [self._start_emb(params, y_cond, N).astype(dtype), emb_in], axis=1)
        conds = x_cond[:, :P] if x_cond_full else jnp.broadcast_to(
            x_cond, (N, P, self.width))
        h_in = (emb_in + params["pos_emb"]["pos_emb"][None, :P].astype(dtype)
                + conds.astype(dtype))

        if self.blocks is not None:
            bc = self.block_ctx
            n_chunk_blocks = max(1, (chunk_size or bc) // bc)
            chunk = n_chunk_blocks * bc
        else:
            chunk = max(1, chunk_size or P)
            n_chunk_blocks = 0  # unused by pure-dense stacks
        n_chunks = P // chunk
        pred_chunks = []

        if n_chunks > 0:
            xs = h_in[:, :n_chunks * chunk].reshape(N, n_chunks, chunk, self.width)
            xs = jnp.moveaxis(xs, 1, 0)

            def chunk_step(caches, inp):
                i, h_chunk = inp
                h, caches = self.transformer.prefill_chunk(
                    dec_params, caches, h_chunk, i * chunk, n_chunk_blocks,
                    encoder_kv=encoder_kv, fp16=fp16)
                return caches, (h if get_preds else ())

            caches, hs = lax.scan(chunk_step, caches, (jnp.arange(n_chunks), xs))
            if get_preds:
                hs = jnp.moveaxis(hs, 0, 1).reshape(N, n_chunks * chunk, self.width)
                pred_chunks.append(hs)

        tail = P - n_chunks * chunk
        if tail > 0:
            tail_in = jnp.moveaxis(h_in[:, n_chunks * chunk:, None], 1, 0)

            def tail_step(caches, inp):
                t, h_t = inp
                h, caches = self.transformer.decode_step(
                    dec_params, caches, h_t, t, encoder_kv=encoder_kv, fp16=fp16)
                return caches, (h if get_preds else ())

            caches, hs = lax.scan(
                tail_step, caches, (n_chunks * chunk + jnp.arange(tail), tail_in))
            if get_preds:
                pred_chunks.append(jnp.moveaxis(hs[:, :, 0], 0, 1))

        prime_preds = None
        if get_preds:
            h_all = jnp.concatenate(pred_chunks, axis=1)
            if self.add_cond_after_transformer:
                h_all = h_all + conds
            prime_preds = self._logits(params, h_all)
        return caches, prime_preds

    # -- ancestral sampling (autoregressive.py:199-249) -----------------------

    def sample(self, params, n_samples, rng, x_cond=None, y_cond=None,
               encoder_kv=None, fp16=False, temp=1.0, top_k=0, top_p=0.0,
               get_preds=False, sample_tokens=None):
        """Fully on-device ancestral sampling. Returns tokens [N, sample_tokens]
        (and logits if get_preds)."""
        if sample_tokens is None:
            sample_tokens = self.input_dims
        N = n_samples
        if not self.x_cond:
            assert x_cond is None
            x_cond = self._default_x_cond(N)

        dtype = jnp.bfloat16 if fp16 else jnp.float32
        caches = self.transformer.init_cache(params["transformer"], N, dtype,
                                             encoder_kv=encoder_kv)
        # stack scan-segment params once, outside the token loop
        dec_params = self.transformer.prepare_decode_params(params["transformer"])

        def step(carry, t):
            caches, x_tok, rng = carry
            logits, caches = self._decode_one(params, dec_params, caches, x_tok,
                                              t, x_cond, y_cond, encoder_kv,
                                              fp16, N)
            tok = self._sample_tok(logits, jax.random.fold_in(rng, t), temp,
                                   top_k, top_p)
            out = (tok, logits[:, 0]) if get_preds else (tok, ())
            return (caches, tok, rng), out

        x0 = jnp.zeros((N, 1), dtype=jnp.int32)
        (_, _, _), (toks, preds) = lax.scan(
            step, (caches, x0, rng), jnp.arange(sample_tokens))
        x = toks[:, :, 0].T  # [N, sample_tokens]
        if get_preds:
            return x, jnp.transpose(preds, (1, 0, 2))
        return x

    # -- primed sampling (autoregressive.py:251-359) --------------------------

    def primed_sample(self, params, n_samples, x_prime, rng, x_cond=None,
                      y_cond=None, encoder_kv=None, fp16=False, temp=1.0,
                      top_k=0, top_p=0.0, get_preds=False, chunk_size=None,
                      sample_tokens=None):
        """Prefill the caches with `x_prime` [N, P] (block-aligned chunks +
        single-token tail), then continue sampling to sample_tokens."""
        if sample_tokens is None:
            sample_tokens = self.input_dims
        N = n_samples
        P = x_prime.shape[1]
        assert 0 < P < sample_tokens
        if not self.x_cond:
            assert x_cond is None
            x_cond = self._default_x_cond(N)

        dtype = jnp.bfloat16 if fp16 else jnp.float32
        caches = self.transformer.init_cache(params["transformer"], N, dtype,
                                             encoder_kv=encoder_kv)
        dec_params = self.transformer.prepare_decode_params(params["transformer"])

        # --- prefill: inputs at position s are token s-1 (start token at 0)
        caches, prime_preds = self._run_prefill(
            params, dec_params, caches, x_prime, x_cond, y_cond, encoder_kv,
            fp16, chunk_size, get_preds=get_preds)

        # --- generation
        def step(carry, t):
            caches, x_tok, rng = carry
            logits, caches = self._decode_one(params, dec_params, caches, x_tok,
                                              t, x_cond, y_cond, encoder_kv,
                                              fp16, N)
            tok = self._sample_tok(logits, jax.random.fold_in(rng, t), temp,
                                   top_k, top_p)
            out = (tok, logits[:, 0]) if get_preds else (tok, ())
            return (caches, tok, rng), out

        x_last = x_prime[:, -1:].astype(jnp.int32)
        (_, _, _), (toks, preds) = lax.scan(
            step, (caches, x_last, rng), jnp.arange(P, sample_tokens))
        x = jnp.concatenate([x_prime, toks[:, :, 0].T], axis=1)
        if get_preds:
            preds = jnp.concatenate([prime_preds, jnp.transpose(preds, (1, 0, 2))],
                                    axis=1)
            return x, preds
        return x
