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

import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from jukebox_tpu.models.attention import FactoredAttention
from jukebox_tpu.ops.core import (ACT_FNS, dense, dense_init, dropout,
                                  layer_norm, layer_norm_init)

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
    resid_dropout: float = 0.0

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"c_fc": dense_init(r1, self.n_in, self.n_state, self.init_scale),
                "c_proj": dense_init(r2, self.n_state, self.n_in, self.init_scale,
                                     zero_out=self.zero_out)}

    def apply(self, params, x, dropout_rng=None):
        m = ACT_FNS[self.afn](dense(params["c_fc"], x))
        return dropout(dense(params["c_proj"], m), self.resid_dropout,
                       dropout_rng)


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
    attn_dropout: float = 0.0
    resid_dropout: float = 0.0

    @property
    def attn(self):
        return FactoredAttention(
            n_in=self.n_in, n_ctx=self.n_ctx, n_state=int(self.m_attn * self.n_in),
            n_head=self.n_head, attn_func=self.attn_func, blocks=self.blocks,
            spread=self.spread, encoder_dims=self.encoder_dims,
            prime_len=self.prime_len, mask=self.mask,
            zero_out=self.zero_out if self.attn_func != 6 else True,
            init_scale=self.init_scale, attn_dropout=self.attn_dropout,
            resid_dropout=self.resid_dropout)

    @property
    def mlp(self):
        return MLP(n_in=self.n_in, n_state=int(self.m_mlp * self.n_in),
                   afn=self.afn, zero_out=self.zero_out,
                   init_scale=self.init_scale,
                   resid_dropout=self.resid_dropout)

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"attn": self.attn.init(r1), "ln_0": layer_norm_init(self.n_in),
                "mlp": self.mlp.init(r2), "ln_1": layer_norm_init(self.n_in)}

    def apply(self, params, x, encoder_kv=None, record=False,
              dropout_rng=None):
        if dropout_rng is not None:
            r_attn, r_mlp = jax.random.split(dropout_rng)
        else:
            r_attn = r_mlp = None

        def attn_fn(p, h):
            return self.attn.apply(p, layer_norm(params["ln_0"], h),
                                   encoder_kv=encoder_kv, record=record,
                                   dropout_rng=r_attn)
        if self.checkpoint_attn and not record:
            attn_fn = jax.checkpoint(attn_fn)
        a, w = attn_fn(params["attn"], x)

        def mlp_fn(p, h):
            return self.mlp.apply(p, layer_norm(params["ln_1"], h),
                                  dropout_rng=r_mlp)
        if self.checkpoint_mlp:
            mlp_fn = jax.checkpoint(mlp_fn)
        m = mlp_fn(params["mlp"], x + a)

        if self.res_scale == 1.0:
            h = x + a + m
        else:
            h = x + self.res_scale * (a + m)
        return h, w

    def decode_step(self, params, cache, x, t, encoder_kv=None, g=None):
        a, cache = self.attn.decode_step(params["attn"], cache,
                                         layer_norm(params["ln_0"], x), t,
                                         encoder_kv=encoder_kv, g=g)
        m = self.mlp.apply(params["mlp"], layer_norm(params["ln_1"], x + a))
        if self.res_scale == 1.0:
            h = x + a + m
        else:
            h = x + self.res_scale * (a + m)
        return h, cache

    def prefill_chunk(self, params, cache, x, t0, n_blocks, encoder_kv=None,
                      g=None, kernel_cache=False):
        a, cache = self.attn.prefill_chunk(params["attn"], cache,
                                           layer_norm(params["ln_0"], x), t0,
                                           n_blocks, encoder_kv=encoder_kv,
                                           g=g, kernel_cache=kernel_cache)
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
    attn_dropout: float = 0.0
    resid_dropout: float = 0.0

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
            checkpoint_mlp=self.checkpoint_mlp,
            attn_dropout=self.attn_dropout, resid_dropout=self.resid_dropout)

    def init(self, rng):
        rngs = jax.random.split(rng, self.n_depth)
        return {"blocks": [self.block_cfg(d).init(rngs[d]) for d in range(self.n_depth)]}

    def apply(self, params, x, encoder_kv=None, fp16=False, fp16_out=False,
              record_layers=frozenset(), dropout_rng=None):
        """Full-context forward. record_layers: set of layer indices whose
        attention softmax to return (for lyric alignment, transformer.py:146-167).
        Returns (x, ws list).

        Like decoding, runs of layers with a repeating attn_func pattern fold
        into a lax.scan over stacked params (decode_plan) — a 72-layer prior
        traces ~21 layer bodies instead of 72, collapsing train-step compile
        time. Attention recording falls back to the flat per-layer loop. The
        train step donates its params, so the stacked copies do not increase
        steady-state HBM."""
        if fp16:
            x = x.astype(jnp.bfloat16)
        drop = dropout_rng is not None and (self.attn_dropout > 0
                                            or self.resid_dropout > 0)
        if not record_layers:
            layer_keys = (jax.random.split(dropout_rng, self.n_depth)
                          if drop else None)
            seg_params = self._segment_trees(params["blocks"])
            for seg, p_seg in zip(self.decode_plan, seg_params):
                if seg[0] == "flat":
                    d = seg[1]
                    cfg = self.block_cfg(d)
                    enc = encoder_kv if cfg.attn_func == 6 else None
                    key = layer_keys[d] if drop else None

                    def block_fn(p, h, _cfg=cfg, _enc=enc, _key=key):
                        return _cfg.apply(p, h, encoder_kv=_enc,
                                          dropout_rng=_key)[0]
                    if self.checkpoint_res == 1:
                        block_fn = jax.checkpoint(block_fn)
                    x = block_fn(p_seg, x)
                else:
                    _, pat, starts = seg
                    # per-(group, position) dropout keys ride as scan inputs
                    if drop:
                        gkeys = jnp.stack(
                            [jnp.stack([layer_keys[s + j]
                                        for j in range(len(pat))])
                             for s in starts])
                        xs = (p_seg, gkeys)
                    else:
                        xs = (p_seg, None)

                    def body(h, inp, _pat=pat):
                        gp, gk = inp
                        for j, f in enumerate(_pat):
                            enc = encoder_kv if f == 6 else None
                            key = gk[j] if gk is not None else None
                            h = self.block_cfg_f(f).apply(
                                gp[j], h, encoder_kv=enc, dropout_rng=key)[0]
                        return h, ()
                    if self.checkpoint_res == 1:
                        body = jax.checkpoint(body)
                    x, _ = jax.lax.scan(body, x, xs)
            if not fp16_out:
                x = x.astype(jnp.float32)
            return x, []

        # Attention-recording forward. The old fallback unrolled all
        # n_depth layers flat, which compiled for minutes at 72-layer scale
        # (alignment was ~330 s of the end-to-end cascade wall, nearly all
        # XLA compile). Instead keep the decode_plan scan folding and unroll
        # ONLY the group(s) containing a recorded layer: scan the groups
        # before it, apply that one group's pattern flat (recording), scan
        # the groups after. Compile cost is ~the plain scanned forward.
        # Recording is an eval path; with dropout active fall back to the
        # flat loop (training never records).
        if drop:
            ws = []
            layer_keys = jax.random.split(dropout_rng, self.n_depth)
            for d in range(self.n_depth):
                cfg = self.block_cfg(d)
                record = d in record_layers
                enc = encoder_kv if cfg.attn_func == 6 else None

                def block_fn(p, h, _cfg=cfg, _enc=enc, _rec=record,
                             _key=layer_keys[d]):
                    return _cfg.apply(p, h, encoder_kv=_enc, record=_rec,
                                      dropout_rng=_key)
                if self.checkpoint_res == 1 and not record:
                    block_fn = jax.checkpoint(block_fn)
                x, w = block_fn(params["blocks"][d], x)
                if record:
                    ws.append(w)
            if not fp16_out:
                x = x.astype(jnp.float32)
            return x, ws

        ws = []  # (depth, w) pairs; returned in depth order
        seg_params = self._segment_trees(params["blocks"])

        def apply_flat(x, d, p, record):
            cfg = self.block_cfg(d)
            enc = encoder_kv if cfg.attn_func == 6 else None
            x, w = cfg.apply(p, x, encoder_kv=enc, record=record)
            if record:
                ws.append((d, w))
            return x

        for seg, p_seg in zip(self.decode_plan, seg_params):
            if seg[0] == "flat":
                d = seg[1]
                x = apply_flat(x, d, p_seg, d in record_layers)
                continue
            _, pat, starts = seg
            rec_groups = [g for g, s in enumerate(starts)
                          if any((s + j) in record_layers
                                 for j in range(len(pat)))]

            def body(h, gp, _pat=pat):
                for j, f in enumerate(_pat):
                    enc = encoder_kv if f == 6 else None
                    h = self.block_cfg_f(f).apply(gp[j], h,
                                                  encoder_kv=enc)[0]
                return h, ()

            def scan_groups(x, g0, g1):
                if g1 <= g0:
                    return x
                p_run = jax.tree_util.tree_map(lambda a: a[g0:g1], p_seg)
                x, _ = jax.lax.scan(body, x, p_run)
                return x

            g_prev = 0
            for g in rec_groups:
                x = scan_groups(x, g_prev, g)
                p_g = jax.tree_util.tree_map(lambda a: a[g], p_seg)
                for j in range(len(pat)):
                    d = starts[g] + j
                    x = apply_flat(x, d, p_g[j], d in record_layers)
                g_prev = g + 1
            x = scan_groups(x, g_prev, len(starts))
        ws = [w for _, w in sorted(ws, key=lambda t: t[0])]
        if not fp16_out:
            x = x.astype(jnp.float32)
        return x, ws

    # -- incremental decoding -------------------------------------------------
    #
    # The decode HLO is kept small by folding runs of layers with a repeating
    # attn_func pattern into a lax.scan over parameters stacked along a
    # leading group axis (the 72-layer attn_order-2 upsampler becomes a
    # 3-layer body scanned 24x; the 79-layer 5b_lyrics order-10 schedule
    # becomes [1,2,3]x3 + a 10-layer body scanned 7x). Layers that do not fit
    # a run (e.g. the interleaved prime/dense layers of orders 11/12) are
    # applied flat. The partition is chosen by a small DP that minimises the
    # number of traced layer bodies.

    def block_cfg_f(self, attn_func):
        """Block config with an explicit attn_func (all other fields are
        depth-independent)."""
        return ResAttnBlock(
            n_in=self.n_in, n_ctx=self.n_ctx, n_head=self.n_head,
            attn_func=attn_func, blocks=self.blocks, spread=self.spread,
            encoder_dims=self.encoder_dims, prime_len=self.prime_len,
            m_attn=self.m_attn, m_mlp=self.m_mlp, mask=self.mask,
            zero_out=self.zero_out, init_scale=self.init_scale,
            res_scale=(1.0 / self.n_depth) if self.res_scale else 1.0,
            afn=self.afn, checkpoint_attn=self.checkpoint_attn,
            checkpoint_mlp=self.checkpoint_mlp,
            attn_dropout=self.attn_dropout, resid_dropout=self.resid_dropout)

    @property
    def decode_plan(self):
        """Partition of the layer stack for incremental decoding, as a tuple
        of segments:
          ("flat", d)                — apply layer d individually
          ("scan", funcs, starts)    — lax.scan over len(starts) groups; each
                                       group is len(funcs) consecutive layers
                                       whose attn_funcs equal `funcs`; group g
                                       covers layers starts[g]..starts[g]+L-1.
        Chosen by DP minimising the total number of traced layer bodies
        (scan body costs len(funcs); flat layer costs 1)."""
        funcs = tuple(self.attn_func(d) for d in range(self.n_depth))
        n = self.n_depth
        cost = [0] * (n + 1)
        choice = [None] * (n + 1)
        for i in range(n - 1, -1, -1):
            best, pick = 1 + cost[i + 1], ("flat",)
            for L in range(1, (n - i) // 2 + 1):
                pat = funcs[i:i + L]
                r = 2
                while i + r * L <= n and funcs[i + (r - 1) * L: i + r * L] == pat:
                    c = L + cost[i + r * L]
                    if c < best:
                        best, pick = c, ("scan", L, r)
                    r += 1
            cost[i], choice[i] = best, pick
        segs, i = [], 0
        while i < n:
            pick = choice[i]
            if pick[0] == "flat":
                segs.append(("flat", i))
                i += 1
            else:
                _, L, r = pick
                segs.append(("scan", funcs[i:i + L],
                             tuple(i + g * L for g in range(r))))
                i += L * r
        return tuple(segs)

    def _segment_trees(self, per_layer, stack=None):
        """Group a per-layer list of pytrees by decode_plan: flat segments
        keep the layer's tree; scan segments hold, per pattern position, the
        groups' trees stacked along a new leading axis. `stack` defaults to
        jnp.stack; pass np.stack to build the stacked layout host-side
        (zero-copy staging: at 5B scale an on-device duplicate of the
        weights does not fit HBM)."""
        stack_ = stack if stack is not None else jnp.stack
        out = []
        for seg in self.decode_plan:
            if seg[0] == "flat":
                out.append(per_layer[seg[1]])
            else:
                _, pat, starts = seg
                out.append(tuple(
                    jax.tree_util.tree_map(
                        lambda *xs: stack_(xs),
                        *[per_layer[s + j] for s in starts])
                    for j in range(len(pat))))
        return out

    def prepare_decode_params(self, params, stack=None):
        """Stack scan-segment layer params once per sampling call (outside
        the token scan, so the stacked copies are loop-invariant), or once on
        the host when staging (stack=np.stack)."""
        return self._segment_trees(params["blocks"], stack=stack)

    # -- whole-stack decode megakernel plumbing --------------------------------
    # [1,2,3]-cycle scan segments (the upsampler stacks) can decode through
    # ops/pallas/decode_stack: ONE kernel launch per token for the whole
    # segment instead of ~10 XLA kernels per layer (1.41x measured at the
    # 1b upsampler shape). Staging packs the segment's weights into the
    # kernel's chunk-major layout; prefill reconstructs standard per-group
    # params from the packed arrays on the fly (one transpose per group per
    # chunk, ~0.2% of a window), and the caches convert standard -> kernel
    # slot-leading layout once per window at the prefill->decode boundary.

    def _stack_eligible(self, seg):
        # {1,2,3}-cycle scans, optionally interleaved with the specials the
        # kernel supports: f6 cross-attention (the 5b order-10
        # (1,2,3,1,2,3,1,2,3,6) segments), f7 prime and f0 dense (order-9
        # (1,2,3,0) cycles; order-11/12 specials usually land flat and pack
        # via _flat_stack_func instead)
        if not (seg[0] == "scan" and set(seg[1]) <= {0, 1, 2, 3, 6, 7}
                and self.blocks is not None):
            return False
        if 7 in seg[1] and not self.prime_len:
            return False
        if self.afn != "quick_gelu":
            return False  # the megakernel hardcodes quick_gelu
        # any width qualifies: the packer lane-pads S/Sm (zero rows/cols +
        # masked LN statistics), so non-lane-divisible widths like the 5b
        # top's 4800 compile too
        if self.n_head == 1:
            return True
        # multi-head: lane-aligned head dims decode via slices, others
        # (e.g. the 5b top's hd=150) via the kernel's full-width masked-head
        # path — only equal head widths are required
        A = int(self.m_attn * self.n_in)
        return A % self.n_head == 0

    def _flat_stack_func(self, d):
        """attn_func of flat layer d if it can run as a single-layer
        (P=1, G=1) megakernel segment, else None. Covers the order-11/12
        schedules' interleaved f7 prime / f0 dense specials and stray
        f1/f2/f3 singles the DP plan left flat — with these packed, the
        whole 72-layer 1b top decodes in-kernel."""
        if self.blocks is None or self.afn != "quick_gelu":
            return None
        f = self.attn_func(d)
        if f not in (0, 1, 2, 3, 7):
            return None  # flat f6 would need enc_proj plumbing; stays XLA
        if f == 7 and not self.prime_len:
            return None
        A = int(self.m_attn * self.n_in)
        if self.n_head > 1 and A % self.n_head:
            return None
        return f

    def pack_stack_segments(self, dec_params, np_=None, quantize=False):
        """Host-side: replace eligible scan segments' stacked trees with the
        megakernel's packed layout ({"stack_packed": [...]}). quantize=True
        stores the weights as int8 with per-out-column scales (halves the
        per-token weight stream)."""
        import numpy as np
        from jukebox_tpu.ops.pallas.decode_stack import (_flatten_packed,
                                                         pack_decode_params)
        xp = np_ or np
        out = []
        for seg, p_seg in zip(self.decode_plan, dec_params):
            if self._stack_eligible(seg):
                pat = tuple(seg[1])
                packed = pack_decode_params(p_seg, np_=xp,
                                            quantize=quantize, pat=pat)
                entry = {"stack_packed": _flatten_packed(packed)}
                # f6 positions keep their encoder-projection params: the
                # cross-attention K/V cache is projected once per window at
                # cache init, not streamed per token
                enc_proj = {str(j): p_seg[j]["attn"]["c_enc_kv"]
                            for j, f in enumerate(pat) if f == 6}
                if enc_proj:
                    entry["enc_proj"] = enc_proj
                out.append(entry)
            elif (seg[0] == "flat"
                  and self._flat_stack_func(seg[1]) is not None):
                f = self._flat_stack_func(seg[1])
                p1 = jax.tree_util.tree_map(lambda x: xp.asarray(x)[None],
                                            p_seg)
                packed = pack_decode_params((p1,), np_=xp,
                                            quantize=quantize, pat=(f,))
                out.append({"stack_packed": _flatten_packed(packed)})
            else:
                out.append(p_seg)
        return out

    def _packed_pat(self, seg, p_seg):
        """The kernel pattern of a packed segment: the scan pattern, or the
        single-layer (f,) pattern of a packed flat special. Derived from the
        STATIC schedule, never from a params leaf — ints stored as pytree
        leaves become tracers when the packed params pass through jit (e.g.
        prior.sample_init), and the pattern drives Python control flow."""
        del p_seg
        if seg[0] == "flat":
            return (self._flat_stack_func(seg[1]),)
        return tuple(seg[1])

    @staticmethod
    def _cache_int8(p_seg, pat):
        """int8 ring caches for a packed segment? Defaults to following the
        weight quantization (the int8 serving mode halves BOTH HBM streams);
        JUKEBOX_INT8_CACHE=1/0 forces it on/off independently."""
        env = os.environ.get("JUKEBOX_INT8_CACHE")
        if env is not None:
            return env != "0"
        from jukebox_tpu.ops.pallas.decode_stack import _pack_keys
        return len(p_seg["stack_packed"]) == len(pat) * len(_pack_keys(True))

    def pack_segment_caches(self, dec_params, caches):
        """Standard-layout caches -> kernel layout for packed segments (the
        one-per-window prefill->decode boundary conversion). bf16 only;
        int8 ring caches (_cache_int8) quantize during the conversion."""
        from jukebox_tpu.ops.pallas.decode_stack import pack_caches
        out = []
        for seg, p_seg, c_seg in zip(self.decode_plan, dec_params, caches):
            if not (isinstance(p_seg, dict) and "stack_packed" in p_seg):
                out.append(c_seg)
                continue
            pat = self._packed_pat(seg, p_seg)
            quant = self._cache_int8(p_seg, pat)
            already = (isinstance(c_seg, tuple) and c_seg
                       and not isinstance(c_seg[0], dict)
                       and len(c_seg) in (2 * len(pat), 4 * len(pat)))
            if already:
                out.append(c_seg)
            elif seg[0] == "flat":
                # standard flat cache {"k","v"} [B, ...] -> one-group stack
                c1 = jax.tree_util.tree_map(lambda x: x[None], c_seg)
                out.append(pack_caches((c1,), self.n_ctx // self.blocks,
                                       pat=pat, quantize=quant))
            else:
                out.append(pack_caches(c_seg, self.n_ctx // self.blocks,
                                       pat=pat, quantize=quant))
        return out

    def has_packed_segments(self, dec_params):
        return any(isinstance(p, dict) and "stack_packed" in p
                   for p in dec_params)

    def cache_batch_axes(self, caches):
        """Pytree of batch-axis indices matching a cache tree from
        init_cache / init_cache_from_segments: flat segments hold [B, ...]
        ring buffers (axis 0), scan segments group-stacked [G, B, ...]
        buffers (axis 1), and packed segments' kernel-layout buffers all
        end with [..., B, Ap] (axis ndim-2). Used by the prefill
        microbatcher to slice/scatter caches along the sample axis."""
        out = []
        for seg, c_seg in zip(self.decode_plan, caches):
            if (isinstance(c_seg, tuple) and c_seg
                    and not isinstance(c_seg[0], dict)):
                # kernel-layout buffers (scan OR packed-flat segments) all
                # end with [..., B, Ap]
                out.append(jax.tree_util.tree_map(
                    lambda leaf: leaf.ndim - 2, c_seg))
            elif seg[0] == "flat":
                out.append(jax.tree_util.tree_map(lambda _: 0, c_seg))
            else:
                out.append(jax.tree_util.tree_map(lambda _: 1, c_seg))
        return out

    def _recon_group(self, flat_g, pat=(1, 2, 3)):
        """Rebuild the len(pat) layers' standard param trees from one
        group's packed slices (prefill / pre-conversion decode path).
        int8-packed segments reconstruct dense's weight-only-int8 form
        ({"w_q","s","b"}) so the prefill matmuls stay int8-streamed too."""
        from jukebox_tpu.ops.pallas.decode_stack import _pack_keys
        S = self.n_in
        A = int(self.m_attn * S)
        quant = len(flat_g) == len(pat) * len(_pack_keys(True))
        keys = _pack_keys(quant)
        per = len(keys)
        trees = []

        def dense_p(w, b, s=None):
            return {"w": w, "b": b} if s is None else \
                {"w_q": w, "b": b, "s": s}

        Sm = int(self.m_mlp * S)
        for j in range(len(pat)):
            d = dict(zip(keys, flat_g[j * per:(j + 1) * per]))
            wq = d["w_qkv"]                            # [n_q, Sp, Ap]
            n_q = wq.shape[0]                          # 1 for f6 (q only)
            w_attn = jnp.moveaxis(wq[:, :S, :A], 0, 1).reshape(S, n_q * A)
            b_attn = d["b_qkv"][:, :A].reshape(n_q * A)
            wp = d["w_proj"]                           # [n_pp, Ap, PW]
            Sp = wp.shape[0] * wp.shape[2]             # lane-padded widths
            Smp = d["w_m1"].shape[0] * d["w_m1"].shape[2]
            w_proj = jnp.moveaxis(wp, 0, 1).reshape(wp.shape[1], Sp)[:A, :S]
            w1 = d["w_m1"]                             # [n_m1, Sp, PW]
            w_m1 = jnp.moveaxis(w1, 0, 1).reshape(w1.shape[1], Smp)[:S, :Sm]
            w2 = d["w_m2"]                             # [n_m2, Smp, PW]
            w_m2 = jnp.moveaxis(w2, 0, 1).reshape(w2.shape[1], Sp)[:Sm, :S]
            if quant:
                s_attn = d["s_qkv"][:, :A].reshape(n_q * A)
                s_proj = d["s_proj"].reshape(Sp)[:S]
                s_m1 = d["s_m1"].reshape(Smp)[:Sm]
                s_m2 = d["s_m2"].reshape(Sp)[:S]
            else:
                s_attn = s_proj = s_m1 = s_m2 = None
            trees.append({
                "attn": {"c_attn": dense_p(w_attn, b_attn, s_attn),
                         "c_proj": dense_p(w_proj,
                                           d["b_proj"].reshape(Sp)[:S],
                                           s_proj)},
                "mlp": {"c_fc": dense_p(w_m1, d["b_m1"].reshape(Smp)[:Sm],
                                        s_m1),
                        "c_proj": dense_p(w_m2, d["b_m2"].reshape(Sp)[:S],
                                          s_m2)},
                "ln_0": {"g": d["ln0_g"][:S], "b": d["ln0_b"][:S]},
                "ln_1": {"g": d["ln1_g"][:S], "b": d["ln1_b"][:S]},
            })
        return trees

    def init_cache_from_segments(self, dec_params, bs, dtype, encoder_kv=None,
                                 sample_ctx=None):
        """Build decode caches directly from segment-shaped params (so raw
        per-layer params never need to exist on device)."""
        out = []
        for seg, p_seg in zip(self.decode_plan, dec_params):
            if isinstance(p_seg, dict) and "stack_packed" in p_seg:
                pat = self._packed_pat(seg, p_seg)
                n_groups = 1 if seg[0] == "flat" else len(seg[2])
                if dtype == jnp.bfloat16:
                    # build DIRECTLY in the megakernel's slot-leading layout:
                    # the prefill writes it in place (kernel_cache=True) and
                    # the decode consumes it — no standard-layout copy, no
                    # prefill->decode conversion transient (whose source +
                    # target peak capped hop batch sizes)
                    from jukebox_tpu.ops.pallas.decode_stack import (
                        SCALE_LANES, _f0_geom, _round_up, pack_caches)
                    quant = self._cache_int8(p_seg, pat)
                    cdtype = jnp.int8 if quant else dtype
                    bc = self.n_ctx // self.blocks
                    A = int(self.m_attn * self.n_in)
                    Ap = _round_up(A, 128)
                    bp = _round_up(bs, 8)  # Mosaic sublane alignment
                    shp = {1: (n_groups, bc, bp, Ap),
                           2: (n_groups, bc, self.blocks, bp, Ap),
                           3: (n_groups, 2, bc, bp, Ap)}
                    if 7 in pat:
                        pl7 = self.block_cfg_f(7).attn._prime_len
                        shp[7] = (n_groups, pl7 + 1, bp, Ap)
                    if 0 in pat:
                        n0 = self.block_cfg_f(0).attn.cache_len(sample_ctx)
                        shp[0] = (n_groups, _f0_geom(n0)[0], bp, Ap)
                    flat6 = []
                    for j, f in enumerate(pat):
                        if f == 6:
                            attn = self.block_cfg_f(6).attn
                            proj = p_seg["enc_proj"][str(j)]
                            std = jax.vmap(lambda pj: attn.init_cache(
                                {"c_enc_kv": pj}, bs, dtype,
                                encoder_kv=encoder_kv,
                                sample_ctx=sample_ctx))(proj)
                            flat6 += list(pack_caches((std,), bc, pat=(6,),
                                                      quantize=quant))
                        else:
                            flat6 += [jnp.zeros(shp[f], cdtype),
                                      jnp.zeros(shp[f], cdtype)]
                            if quant:
                                sshp = shp[f][:-1] + (SCALE_LANES,)
                                flat6 += [jnp.zeros(sshp, jnp.bfloat16),
                                          jnp.zeros(sshp, jnp.bfloat16)]
                    out.append(tuple(flat6))
                    continue
                # fp32 path: standard layout (XLA recon decode, no kernel)
                caches = []
                for j, f in enumerate(pat):
                    attn = self.block_cfg_f(f).attn
                    if f == 6:
                        # per-group encoder K/V projections from the kept
                        # enc_proj params (see pack_stack_segments)
                        proj = p_seg["enc_proj"][str(j)]
                        caches.append(jax.vmap(
                            lambda pj: attn.init_cache(
                                {"c_enc_kv": pj}, bs, dtype,
                                encoder_kv=encoder_kv,
                                sample_ctx=sample_ctx))(proj))
                        continue
                    one = attn.init_cache(None, bs, dtype,
                                          sample_ctx=sample_ctx)
                    caches.append(jax.tree_util.tree_map(
                        lambda c: jnp.zeros((n_groups, *c.shape), c.dtype),
                        one))
                out.append(tuple(caches))
            elif seg[0] == "flat":
                cfg = self.block_cfg(seg[1])
                enc = encoder_kv if cfg.attn_func == 6 else None
                out.append(cfg.attn.init_cache(p_seg["attn"], bs, dtype,
                                               encoder_kv=enc,
                                               sample_ctx=sample_ctx))
            else:
                _, pat, _ = seg
                caches = []
                for j, f in enumerate(pat):
                    attn = self.block_cfg_f(f).attn
                    if f == 6:
                        # per-group encoder K/V projections, vmapped over the
                        # stacked group axis
                        caches.append(jax.vmap(
                            lambda p: attn.init_cache(p, bs, dtype,
                                                      encoder_kv=encoder_kv,
                                                      sample_ctx=sample_ctx))(
                            p_seg[j]["attn"]))
                    else:
                        # ring caches are zeros — params only matter for f6
                        n_groups = jax.tree_util.tree_leaves(
                            p_seg[j])[0].shape[0]
                        one = attn.init_cache(
                            jax.tree_util.tree_map(lambda x: x[0],
                                                   p_seg[j])["attn"],
                            bs, dtype, sample_ctx=sample_ctx)
                        caches.append(jax.tree_util.tree_map(
                            lambda c: jnp.zeros((n_groups, *c.shape),
                                                c.dtype), one))
                out.append(tuple(caches))
        return out

    def init_cache(self, params, bs, dtype, encoder_kv=None, sample_ctx=None):
        per_layer = []
        for d in range(self.n_depth):
            cfg = self.block_cfg(d)
            enc = encoder_kv if cfg.attn_func == 6 else None
            per_layer.append(cfg.attn.init_cache(params["blocks"][d]["attn"],
                                                 bs, dtype, encoder_kv=enc,
                                                 sample_ctx=sample_ctx))
        return self._segment_trees(per_layer)

    def _segmented_apply(self, method, dec_params, caches, x, args,
                         encoder_kv=None):
        """Run `method` (decode_step / prefill_chunk, called as
        method(params, cache, x, *args, encoder_kv=...)) over the decode_plan
        segments."""
        new_caches = []
        for seg, p_seg, c_seg in zip(self.decode_plan, dec_params, caches):
            if isinstance(p_seg, dict) and "stack_packed" in p_seg:
                flat = p_seg["stack_packed"]
                pat_t = self._packed_pat(seg, p_seg)
                n_groups = 1 if seg[0] == "flat" else len(seg[2])
                kernel_caches = (isinstance(c_seg, tuple) and c_seg
                                 and not isinstance(c_seg[0], dict)
                                 and len(c_seg) in (2 * len(pat_t),
                                                    4 * len(pat_t)))
                cache_q = (kernel_caches and len(c_seg) == 4 * len(pat_t)
                           and c_seg[0].dtype == jnp.int8)
                if method == "decode_step" and kernel_caches:
                    # whole-segment megakernel: one launch per token
                    from jukebox_tpu.ops.pallas.decode_stack import (
                        _pack_keys, build_stack_decode)
                    assert x.dtype == jnp.bfloat16, \
                        "stack kernel decodes bf16 (fp16=True)"
                    S = self.n_in
                    A = int(self.m_attn * S)
                    G = flat[0].shape[0]
                    cfg1 = self.block_cfg_f(1)
                    stride = 4 if cache_q else 2
                    enc_rows = prime_rows = f0_rows = 0
                    if 6 in pat_t:
                        # read-only enc cache [G, enc_rows, B, Ap]
                        enc_rows = c_seg[stride * pat_t.index(6)].shape[1]
                    if 7 in pat_t:
                        # [G, prime_rows + 1, B, Ap] (garbage row included)
                        prime_rows = c_seg[stride * pat_t.index(7)].shape[1] - 1
                    if 0 in pat_t:
                        # [G, f0_rows, B, Ap] (already chunk-padded)
                        f0_rows = c_seg[stride * pat_t.index(0)].shape[1]
                    mk = build_stack_decode(
                        S, A, int(self.m_mlp * S), self.n_ctx // self.blocks,
                        self.blocks, G, x.shape[0],
                        res_scale=cfg1.res_scale,
                        quantized=len(flat) == len(pat_t)
                        * len(_pack_keys(True)),
                        cache_quantized=cache_q,
                        pat=pat_t, n_head=self.n_head, enc_rows=enc_rows,
                        prime_rows=prime_rows, f0_rows=f0_rows,
                        interpret=jax.devices()[0].platform == "cpu")
                    x, nc = mk(flat, c_seg, x, args[0])
                else:
                    # prefill (or fp32 decode tail): reconstruct standard
                    # per-group params from the packed arrays. With
                    # kernel-layout caches the prefill writes them directly
                    # (kernel_cache=True; the flat (k,v,...) tuple is
                    # viewed as per-position dicts for the scan carry)
                    if kernel_caches:
                        assert method == "prefill_chunk", method
                        ckeys = ("k", "v", "ks", "vs") if cache_q \
                            else ("k", "v")
                        st = len(ckeys)
                        gc0 = tuple(
                            {key: c_seg[st * j + i]
                             for i, key in enumerate(ckeys)}
                            for j in range(len(pat_t)))
                    else:
                        gc0 = tuple(c_seg)

                    def body(carry, inp, _pat=pat_t, _kc=kernel_caches):
                        h, gc = carry
                        flat_g, g = inp
                        trees = self._recon_group(flat_g, pat=_pat)
                        kw = {"kernel_cache": True} if _kc else {}
                        ncs = []
                        for j, f in enumerate(_pat):
                            h, c = getattr(self.block_cfg_f(f), method)(
                                trees[j], gc[j], h, *args, encoder_kv=None,
                                g=g, **kw)
                            ncs.append(c)
                        return (h, tuple(ncs)), ()

                    (x, nc), _ = jax.lax.scan(
                        body, (x, gc0),
                        (flat, jnp.arange(n_groups)))
                    if kernel_caches:
                        nc = tuple(c[key] for c in nc for key in ckeys)
                new_caches.append(nc)
                continue
            if seg[0] == "flat":
                cfg = self.block_cfg(seg[1])
                enc = encoder_kv if cfg.attn_func == 6 else None
                x, nc = getattr(cfg, method)(p_seg, c_seg, x, *args,
                                             encoder_kv=enc)
            else:
                _, pat, starts = seg
                # the group-stacked caches ride in the scan CARRY and each
                # group updates its slice in place (grouped dynamic_update_
                # slice at index g). Streaming them through xs/ys instead
                # would DMA every cache in full and write a full updated
                # copy per token — gigabytes of HBM traffic per step at
                # 1b/5b scale and the allocator pressure that kept bs=16
                # from fitting.
                def body(carry, inp, _pat=pat):
                    h, gc = carry
                    gp, g = inp
                    ncs = []
                    for j, f in enumerate(_pat):
                        enc = encoder_kv if f == 6 else None
                        h, c = getattr(self.block_cfg_f(f), method)(
                            gp[j], gc[j], h, *args, encoder_kv=enc, g=g)
                        ncs.append(c)
                    return (h, tuple(ncs)), ()

                (x, nc), _ = jax.lax.scan(
                    body, (x, tuple(c_seg)),
                    (p_seg, jnp.arange(len(starts))))
            new_caches.append(nc)
        return x, new_caches

    def decode_step(self, dec_params, caches, x, t, encoder_kv=None,
                    fp16=False, fp16_out=False):
        """One-token decode. dec_params comes from prepare_decode_params."""
        if fp16:
            x = x.astype(jnp.bfloat16)
        x, new_caches = self._segmented_apply("decode_step", dec_params,
                                              caches, x, (t,),
                                              encoder_kv=encoder_kv)
        if not fp16_out:
            x = x.astype(jnp.float32)
        return x, new_caches

    def prefill_chunk(self, dec_params, caches, x, t0, n_blocks,
                      encoder_kv=None, fp16=False, fp16_out=False):
        if fp16:
            x = x.astype(jnp.bfloat16)
        x, new_caches = self._segmented_apply("prefill_chunk", dec_params,
                                              caches, x, (t0, n_blocks),
                                              encoder_kv=encoder_kv)
        if not fp16_out:
            x = x.astype(jnp.float32)
        return x, new_caches
