"""Encoder / decoder conv stacks (TPU equivalent of jukebox/vqvae/encdec.py).

Encoder level block: down_t x [strided Conv1d(filter=2*stride, pad=stride//2)
-> Resnet1D], then Conv1d(3,1,1) to the embedding width (encdec.py:6-26).
Decoder mirrors it with transposed convs and reversed dilation
(encdec.py:28-46). Activations are feature-last [N, T, C].
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax

from jukebox_tpu.models.resnet import Resnet1D
from jukebox_tpu.ops.core import (
    conv1d,
    conv1d_init,
    conv_transpose1d,
    conv_transpose1d_init,
)


@dataclass(frozen=True)
class BlockCfg:
    """Shared conv-block hyperparameters (reference block_kwargs)."""
    width: int = 128
    depth: int = 3
    m_conv: float = 1.0
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    zero_out: bool = False
    res_scale: bool = False
    reverse_decoder_dilation: bool = False
    checkpoint_res: int = 0


@dataclass(frozen=True)
class EncoderConvBlock:
    input_emb_width: int
    output_emb_width: int
    down_t: int
    stride_t: int
    block: BlockCfg

    def _resnet(self):
        b = self.block
        return Resnet1D(b.width, b.depth, b.m_conv, b.dilation_growth_rate,
                        b.dilation_cycle, b.zero_out, b.res_scale,
                        checkpoint_res=b.checkpoint_res)

    def init(self, rng):
        downs = []
        b = self.block
        for i in range(self.down_t):
            r1, r2, rng = jax.random.split(rng, 3)
            n_in = self.input_emb_width if i == 0 else b.width
            downs.append({
                "conv_down": conv1d_init(r1, n_in, b.width, self.stride_t * 2),
                "resnet": self._resnet().init(r2),
            })
        proj = conv1d_init(rng, b.width, self.output_emb_width, 3) if self.down_t > 0 else None
        return {"downs": downs, "proj": proj}

    def apply(self, params, x):
        if self.down_t == 0:
            return x
        stride = self.stride_t
        resnet = self._resnet()
        for p in params["downs"]:
            x = conv1d(p["conv_down"], x, stride=stride, padding=stride // 2)
            x = resnet.apply(p["resnet"], x)
        return conv1d(params["proj"], x, padding=1)


@dataclass(frozen=True)
class DecoderConvBlock:
    input_emb_width: int   # final output width (mirrors encoder input)
    output_emb_width: int  # embedding width at the block input
    down_t: int
    stride_t: int
    block: BlockCfg

    def _resnet(self):
        b = self.block
        return Resnet1D(b.width, b.depth, b.m_conv, b.dilation_growth_rate,
                        b.dilation_cycle, b.zero_out, b.res_scale,
                        reverse_dilation=b.reverse_decoder_dilation,
                        checkpoint_res=b.checkpoint_res)

    def init(self, rng):
        if self.down_t == 0:
            return {"proj": None, "ups": []}
        b = self.block
        rng, r0 = jax.random.split(rng)
        proj = conv1d_init(r0, self.output_emb_width, b.width, 3)
        ups = []
        for i in range(self.down_t):
            r1, r2, rng = jax.random.split(rng, 3)
            n_out = self.input_emb_width if i == (self.down_t - 1) else b.width
            ups.append({
                "resnet": self._resnet().init(r1),
                "conv_up": conv_transpose1d_init(r2, b.width, n_out, self.stride_t * 2),
            })
        return {"proj": proj, "ups": ups}

    def apply(self, params, x):
        if self.down_t == 0:
            return x
        stride = self.stride_t
        resnet = self._resnet()
        x = conv1d(params["proj"], x, padding=1)
        for p in params["ups"]:
            x = resnet.apply(p["resnet"], x)
            x = conv_transpose1d(p["conv_up"], x, stride=stride, padding=stride // 2)
        return x


@dataclass(frozen=True)
class Encoder:
    """Multi-level strided encoder (encdec.py:48-85). apply() returns the list
    of per-level latents [N, T/hop_l, emb_width]."""
    input_emb_width: int
    output_emb_width: int
    levels: int
    downs_t: Tuple[int, ...]
    strides_t: Tuple[int, ...]
    block: BlockCfg

    def _level_block(self, level):
        n_in = self.input_emb_width if level == 0 else self.output_emb_width
        return EncoderConvBlock(n_in, self.output_emb_width,
                                self.downs_t[level], self.strides_t[level], self.block)

    def init(self, rng):
        rngs = jax.random.split(rng, self.levels)
        return {"level_blocks": [self._level_block(l).init(rngs[l]) for l in range(self.levels)]}

    def apply(self, params, x):
        xs = []
        for level in range(self.levels):
            x = self._level_block(level).apply(params["level_blocks"][level], x)
            xs.append(x)
        return xs


@dataclass(frozen=True)
class Decoder:
    """Multi-level decoder (encdec.py:87-131). apply() takes the list of
    latents (or just the deepest when all_levels=False) and returns audio
    [N, T, input_emb_width]."""
    input_emb_width: int
    output_emb_width: int
    levels: int
    downs_t: Tuple[int, ...]
    strides_t: Tuple[int, ...]
    block: BlockCfg

    def _level_block(self, level):
        return DecoderConvBlock(self.output_emb_width, self.output_emb_width,
                                self.downs_t[level], self.strides_t[level], self.block)

    def init(self, rng):
        rngs = jax.random.split(rng, self.levels + 1)
        return {
            "level_blocks": [self._level_block(l).init(rngs[l]) for l in range(self.levels)],
            "out": conv1d_init(rngs[-1], self.output_emb_width, self.input_emb_width, 3),
        }

    def apply(self, params, xs, all_levels=True):
        if all_levels:
            assert len(xs) == self.levels
        else:
            assert len(xs) == 1
        x = xs[-1]
        for level in reversed(range(self.levels)):
            x = self._level_block(level).apply(params["level_blocks"][level], x)
            if level != 0 and all_levels:
                x = x + xs[level - 1]
        return conv1d(params["out"], x, padding=1)
