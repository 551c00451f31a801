"""Dilated residual 1-D conv stacks (TPU equivalent of jukebox/vqvae/resnet.py).

Each block is ReLU -> Conv1d(3, dilation) -> ReLU -> Conv1d(1) with a residual
connection, dilation = growth_rate ** (depth % cycle), optional zero-init of
the final conv and 1/sqrt(depth) residual scaling (resnet.py:27-75).

Activation rematerialisation replaces the reference's per-block
torch.autograd checkpointing (checkpoint_res): we wrap the block apply in
jax.checkpoint so XLA recomputes activations in the backward pass.
"""

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax

from jukebox_tpu.ops.core import conv1d, conv1d_init


@dataclass(frozen=True)
class Resnet1D:
    n_in: int
    n_depth: int
    m_conv: float = 1.0
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    zero_out: bool = False
    res_scale: bool = False
    reverse_dilation: bool = False
    checkpoint_res: int = 0

    @property
    def n_state(self) -> int:
        return int(self.m_conv * self.n_in)

    @property
    def dilations(self) -> Tuple[int, ...]:
        def _get_depth(depth):
            return depth if self.dilation_cycle is None else depth % self.dilation_cycle
        ds = tuple(self.dilation_growth_rate ** _get_depth(d) for d in range(self.n_depth))
        return ds[::-1] if self.reverse_dilation else ds

    @property
    def scale(self) -> float:
        return 1.0 if not self.res_scale else 1.0 / math.sqrt(self.n_depth)

    def init(self, rng):
        blocks = []
        for d in range(self.n_depth):
            r1, r2, rng = jax.random.split(rng, 3)
            blocks.append({
                "conv_dil": conv1d_init(r1, self.n_in, self.n_state, 3),
                "conv_1x1": conv1d_init(r2, self.n_state, self.n_in, 1, zero_out=self.zero_out),
            })
        if self.reverse_dilation:
            blocks = blocks[::-1]
        return {"blocks": blocks}

    def _block(self, p, x, dilation):
        h = jax.nn.relu(x)
        h = conv1d(p["conv_dil"], h, padding=dilation, dilation=dilation)
        h = jax.nn.relu(h)
        h = conv1d(p["conv_1x1"], h)
        return x + self.scale * h

    def apply(self, params, x):
        block = self._block
        if self.checkpoint_res == 1:
            block = jax.checkpoint(block, static_argnums=(2,))
        for p, dilation in zip(params["blocks"], self.dilations):
            x = block(p, x, dilation)
        return x
