"""Pre-LN residual transformer with per-depth factored-attention schedules
(TPU equivalent of jukebox/transformer/transformer.py).

attn_order schedules 0-12 map depth -> attn_func exactly as the reference
(transformer.py:111-126); notable: 2 = row/col/prev-row cycle (all music
priors), 10 = the 79-layer 5b_lyrics schedule with interleaved cross-attn,
12 = the single_enc_dec schedule using prime attention.

Three modes mirroring FactoredAttention: full-context `apply`, one-token
`decode_step`, and block-aligned `prefill_chunk`, each threading the
per-layer ring caches.
"""

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from jukebox_tpu.models.attention import FactoredAttention
from jukebox_tpu.ops.core import ACT_FNS, dense, dense_init, layer_norm, layer_norm_init

# depth -> attn_func schedules (reference transformer.py:111-126)
ATTN_ORDERS = {
    0: lambda d: 0,
    1: lambda d: [1, 2][d % 2],
    2: lambda d: [1, 2, 3][d % 3],
    3: lambda d: [1, 4][d % 2],
    4: lambda d: [1, 5][d % 2],
    5: lambda d: [1, 4, 1, 1][d % 4],
    6: lambda d: [1, 2, 3, 6][d % 4],
    7: lambda d: [*[1, 2, 3] * 5, 6][d % 16],
    8: lambda d: [1, 2, 3, 1, 2, 3, 1, 2, 3, 6][d % 10],
    9: lambda d: [1, 2, 3, 0][d % 4],
    10: lambda d: [*[1, 2, 3] * 3, *[1, 2, 3, 1, 2, 3, 1, 2, 3, 6] * 7][d % 79],
    11: lambda d: ([6, 6, 0][d % 3] if d % 16 == 15 else [1, 2, 3][d % 3]),
    12: lambda d: ([7, 7, 0][d % 3] if d % 16 == 15 else [1, 2, 3][d % 3]),
}

ATTN_CYCLES = {0: 1, 1: 2, 2: 3, 3: 2, 4: 2, 5: 4, 6: 4, 7: 16, 8: 10, 9: 4,
               10: 79, 11: 16, 12: 16}


@dataclass(frozen=True)
class MLP:
    n_in: int
    n_state: int
    afn: str = "quick_gelu"
    zero_out: bool = False
    init_scale: float = 1.0

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"c_fc": dense_init(r1, self.n_in, self.n_state, self.init_scale),
                "c_proj": dense_init(r2, self.n_state, self.n_in, self.init_scale,
                                     zero_out=self.zero_out)}

    def apply(self, params, x):
        m = ACT_FNS[self.afn](dense(params["c_fc"], x))
        return dense(params["c_proj"], m)


@dataclass(frozen=True)
class ResAttnBlock:
    n_in: int
    n_ctx: int
    n_head: int
    attn_func: int
    blocks: Optional[int] = None
    spread: Optional[int] = None
    encoder_dims: Optional[int] = None
    prime_len: Optional[int] = None
    m_attn: float = 0.25
    m_mlp: float = 1.0
    mask: bool = False
    zero_out: bool = False
    init_scale: float = 1.0
    res_scale: float = 1.0
    afn: str = "quick_gelu"
    checkpoint_attn: int = 0
    checkpoint_mlp: int = 0

    @property
    def attn(self):
        return FactoredAttention(
            n_in=self.n_in, n_ctx=self.n_ctx, n_state=int(self.m_attn * self.n_in),
            n_head=self.n_head, attn_func=self.attn_func, blocks=self.blocks,
            spread=self.spread, encoder_dims=self.encoder_dims,
            prime_len=self.prime_len, mask=self.mask,
            zero_out=self.zero_out if self.attn_func != 6 else True,
            init_scale=self.init_scale)

    @property
    def mlp(self):
        return MLP(n_in=self.n_in, n_state=int(self.m_mlp * self.n_in),
                   afn=self.afn, zero_out=self.zero_out, init_scale=self.init_scale)

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"attn": self.attn.init(r1), "ln_0": layer_norm_init(self.n_in),
                "mlp": self.mlp.init(r2), "ln_1": layer_norm_init(self.n_in)}

    def apply(self, params, x, encoder_kv=None, record=False):
        def attn_fn(p, h):
            return self.attn.apply(p, layer_norm(params["ln_0"], h),
                                   encoder_kv=encoder_kv, record=record)
        if self.checkpoint_attn and not record:
            attn_fn = jax.checkpoint(attn_fn)
        a, w = attn_fn(params["attn"], x)

        def mlp_fn(p, h):
            return self.mlp.apply(p, layer_norm(params["ln_1"], h))
        if self.checkpoint_mlp:
            mlp_fn = jax.checkpoint(mlp_fn)
        m = mlp_fn(params["mlp"], x + a)

        if self.res_scale == 1.0:
            h = x + a + m
        else:
            h = x + self.res_scale * (a + m)
        return h, w

    def decode_step(self, params, cache, x, t, encoder_kv=None):
        a, cache = self.attn.decode_step(params["attn"], cache,
                                         layer_norm(params["ln_0"], x), t,
                                         encoder_kv=encoder_kv)
        m = self.mlp.apply(params["mlp"], layer_norm(params["ln_1"], x + a))
        if self.res_scale == 1.0:
            h = x + a + m
        else:
            h = x + self.res_scale * (a + m)
        return h, cache

    def prefill_chunk(self, params, cache, x, t0, n_blocks, encoder_kv=None):
        a, cache = self.attn.prefill_chunk(params["attn"], cache,
                                           layer_norm(params["ln_0"], x), t0,
                                           n_blocks, encoder_kv=encoder_kv)
        m = self.mlp.apply(params["mlp"], layer_norm(params["ln_1"], x + a))
        if self.res_scale == 1.0:
            h = x + a + m
        else:
            h = x + self.res_scale * (a + m)
        return h, cache


@dataclass(frozen=True)
class Transformer:
    n_in: int
    n_ctx: int
    n_head: int
    n_depth: int
    attn_order: int = 0
    blocks: Optional[int] = None
    spread: Optional[int] = None
    encoder_dims: Optional[int] = None
    prime_len: Optional[int] = None
    m_attn: float = 0.25
    m_mlp: float = 1.0
    mask: bool = False
    zero_out: bool = False
    init_scale: float = 1.0
    res_scale: bool = False
    afn: str = "quick_gelu"
    checkpoint_attn: int = 0
    checkpoint_mlp: int = 0
    checkpoint_res: int = 0

    def attn_func(self, d):
        return ATTN_ORDERS[self.attn_order](d)

    def block_cfg(self, d):
        return ResAttnBlock(
            n_in=self.n_in, n_ctx=self.n_ctx, n_head=self.n_head,
            attn_func=self.attn_func(d), blocks=self.blocks, spread=self.spread,
            encoder_dims=self.encoder_dims, prime_len=self.prime_len,
            m_attn=self.m_attn, m_mlp=self.m_mlp, mask=self.mask,
            zero_out=self.zero_out, init_scale=self.init_scale,
            res_scale=(1.0 / self.n_depth) if self.res_scale else 1.0,
            afn=self.afn, checkpoint_attn=self.checkpoint_attn,
            checkpoint_mlp=self.checkpoint_mlp)

    def init(self, rng):
        rngs = jax.random.split(rng, self.n_depth)
        return {"blocks": [self.block_cfg(d).init(rngs[d]) for d in range(self.n_depth)]}

    def apply(self, params, x, encoder_kv=None, fp16=False, fp16_out=False,
              record_layers=frozenset()):
        """Full-context forward. record_layers: set of layer indices whose
        attention softmax to return (for lyric alignment, transformer.py:146-167).
        Returns (x, ws list)."""
        if fp16:
            x = x.astype(jnp.bfloat16)
        ws = []
        for d in range(self.n_depth):
            cfg = self.block_cfg(d)
            record = d in record_layers
            enc = encoder_kv if cfg.attn_func == 6 else None

            def block_fn(p, h, _cfg=cfg, _enc=enc, _rec=record):
                return _cfg.apply(p, h, encoder_kv=_enc, record=_rec)
            if self.checkpoint_res == 1 and not record:
                block_fn = jax.checkpoint(block_fn)
            x, w = block_fn(params["blocks"][d], x)
            if record:
                ws.append(w)
        if not fp16_out:
            x = x.astype(jnp.float32)
        return x, ws

    # -- incremental decoding -------------------------------------------------

    @property
    def stacked_cycle(self):
        """Cycle length when the depth can be folded into a lax.scan over
        stacked per-cycle-position parameters (identical param structure and
        cache shape per position). Shrinks the decode HLO by n_depth/cycle —
        a 72-layer attn_order-2 prior becomes a 3-layer body scanned 24x."""
        cycle = ATTN_CYCLES[self.attn_order]
        if self.n_depth % cycle or self.n_depth == cycle:
            return None
        funcs = {self.attn_func(d) for d in range(self.n_depth)}
        if not funcs <= {1, 2, 3}:  # ring-cache patterns only
            return None
        return cycle

    def _stack_cycle(self, trees):
        """[per-layer trees] -> list of `cycle` trees with a leading
        n_groups axis."""
        c = self.stacked_cycle
        n_groups = self.n_depth // c
        return [jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[trees[g * c + j] for g in range(n_groups)])
                for j in range(c)]

    def init_cache(self, params, bs, dtype, encoder_kv=None, sample_ctx=None):
        caches = []
        for d in range(self.n_depth):
            cfg = self.block_cfg(d)
            enc = encoder_kv if cfg.attn_func == 6 else None
            caches.append(cfg.attn.init_cache(params["blocks"][d]["attn"], bs, dtype,
                                              encoder_kv=enc, sample_ctx=sample_ctx))
        if self.stacked_cycle:
            return self._stack_cycle(caches)
        return caches

    def _stacked_apply(self, method, params, caches, x, *args):
        c = self.stacked_cycle
        stacked_params = self._stack_cycle(params["blocks"])

        def body(x, inp):
            group_params, group_caches = inp
            new_caches = []
            for j in range(c):
                x, nc = getattr(self.block_cfg(j), method)(
                    group_params[j], group_caches[j], x, *args)
                new_caches.append(nc)
            return x, tuple(new_caches)

        x, new_caches = jax.lax.scan(body, x, (tuple(stacked_params),
                                               tuple(caches)))
        return x, list(new_caches)

    def decode_step(self, params, caches, x, t, encoder_kv=None, fp16=False,
                    fp16_out=False):
        if fp16:
            x = x.astype(jnp.bfloat16)
        if self.stacked_cycle:
            x, new_caches = self._stacked_apply("decode_step", params, caches,
                                                x, t)
        else:
            new_caches = []
            for d in range(self.n_depth):
                cfg = self.block_cfg(d)
                enc = encoder_kv if cfg.attn_func == 6 else None
                x, c = cfg.decode_step(params["blocks"][d], caches[d], x, t,
                                       encoder_kv=enc)
                new_caches.append(c)
        if not fp16_out:
            x = x.astype(jnp.float32)
        return x, new_caches

    def prefill_chunk(self, params, caches, x, t0, n_blocks, encoder_kv=None,
                      fp16=False, fp16_out=False):
        if fp16:
            x = x.astype(jnp.bfloat16)
        if self.stacked_cycle:
            x, new_caches = self._stacked_apply("prefill_chunk", params, caches,
                                                x, t0, n_blocks)
        else:
            new_caches = []
            for d in range(self.n_depth):
                cfg = self.block_cfg(d)
                enc = encoder_kv if cfg.attn_func == 6 else None
                x, c = cfg.prefill_chunk(params["blocks"][d], caches[d], x, t0,
                                         n_blocks, encoder_kv=enc)
                new_caches.append(c)
        if not fp16_out:
            x = x.astype(jnp.float32)
        return x, new_caches
