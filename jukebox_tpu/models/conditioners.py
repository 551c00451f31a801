"""Conditioning modules — TPU equivalent of jukebox/prior/conditioners.py.

* Conditioner: embeds upper-level codes and upsamples them to per-token
  conditioning via a transposed-conv decoder stack + LayerNorm (:8-48).
* LabelConditioner: artist embedding + bag-of-words genre embedding (masked
  -1 slots) -> one start embedding; three timing signals binned through
  RangeEmbedding interpolation -> per-token positional conditioning (:70-157).
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from jukebox_tpu.models.encdec import BlockCfg, DecoderConvBlock
from jukebox_tpu.ops.core import layer_norm, layer_norm_init


@dataclass(frozen=True)
class Conditioner:
    input_shape: Tuple[int, ...]
    bins: int
    down_t: int
    stride_t: int
    out_width: int
    init_scale: float
    block: BlockCfg

    @property
    def cond(self):
        return DecoderConvBlock(self.out_width, self.out_width, self.down_t,
                                self.stride_t, self.block)

    def init(self, rng):
        r_emb, r_cond = jax.random.split(rng)
        return {
            "x_emb": {"weight": 0.02 * self.init_scale * jax.random.normal(
                r_emb, (self.bins, self.out_width), dtype=jnp.float32)},
            "cond": self.cond.init(r_cond),
            "ln": layer_norm_init(self.out_width),
        }

    def apply(self, params, x, x_cond=None):
        """x: int codes [N, T]; x_cond: optional residual conditioning
        [N, T, W]. Returns [N, T * stride**down, W]."""
        assert x.shape[1:] == tuple(self.input_shape)
        h = jnp.take(params["x_emb"]["weight"], x, axis=0)
        if x_cond is not None:
            h = h + x_cond
        h = self.cond.apply(params["cond"], h)
        return layer_norm(params["ln"], h)


@dataclass(frozen=True)
class RangeEmbedding:
    """Interpolate [pos_start, pos_end] over n_time positions, bin each into
    `bins` buckets of [pos_min, pos_max), and embed (conditioners.py:70-111)."""
    n_time: int
    bins: int
    pos_range: Tuple[float, float]
    out_width: int
    init_scale: float
    clamp: bool = False

    def init(self, rng):
        return {"emb": {"weight": 0.01 * self.init_scale * jax.random.normal(
            rng, (self.bins, self.out_width), dtype=jnp.float32)}}

    def apply(self, params, pos_start, pos_end=None):
        pos_min, pos_max = self.pos_range
        pos_start = pos_start.astype(jnp.float32)
        if pos_end is not None:
            if self.clamp:
                pos_end = jnp.clip(pos_end, pos_min, pos_max)
            pos_end = pos_end.astype(jnp.float32)
        if self.n_time != 1:
            assert pos_end is not None
            interpolation = (jnp.arange(self.n_time, dtype=jnp.float32)
                             / self.n_time)[None, :]
            position = pos_start + (pos_end - pos_start) * interpolation
        else:
            position = pos_start
        normalised = (position - pos_min) / (pos_max - pos_min)
        bins_ = jnp.floor(self.bins * normalised).astype(jnp.int32)
        bins_ = jnp.clip(bins_, 0, self.bins - 1)
        return jnp.take(params["emb"]["weight"], bins_, axis=0)


@dataclass(frozen=True)
class LabelConditioner:
    y_bins: Tuple[int, int]  # (bow genre bins, artist bins)
    t_bins: int
    sr: int
    min_duration: float
    max_duration: float
    n_time: int
    out_width: int
    init_scale: float
    max_bow_genre_size: int
    include_time_signal: bool

    @property
    def _t_embs(self):
        total_length_range = (self.min_duration * self.sr, self.max_duration * self.sr)
        absolute_pos_range = (0.0, self.max_duration * self.sr)
        relative_pos_range = (0.0, 1.0)
        return {
            "total_length_emb": RangeEmbedding(1, self.t_bins, total_length_range,
                                               self.out_width, self.init_scale),
            "absolute_pos_emb": RangeEmbedding(self.n_time, self.t_bins,
                                               absolute_pos_range, self.out_width,
                                               self.init_scale),
            "relative_pos_emb": RangeEmbedding(self.n_time, self.t_bins,
                                               relative_pos_range, self.out_width,
                                               self.init_scale, clamp=True),
        }

    def init(self, rng):
        bow_genre_bins, artist_bins = self.y_bins
        r_g, r_a, rng = jax.random.split(rng, 3)
        params = {
            "bow_genre_emb": {"emb": {"weight": 0.01 * self.init_scale *
                jax.random.normal(r_g, (bow_genre_bins, self.out_width),
                                  dtype=jnp.float32)}},
            "artist_emb": {"emb": {"weight": 0.01 * self.init_scale *
                jax.random.normal(r_a, (artist_bins, self.out_width),
                                  dtype=jnp.float32)}},
        }
        if self.include_time_signal:
            for name, emb in self._t_embs.items():
                rng, r = jax.random.split(rng)
                params[name] = emb.init(r)
        return params

    def apply(self, params, y):
        """y: [N, 4 + max_bow_genre_size] int labels
        (total_length, offset, length, artist, *genres). Returns
        (start_emb [N,1,W], pos_emb [N,n_time,W] or None)."""
        assert y.shape[-1] == 4 + self.max_bow_genre_size
        N = y.shape[0]
        total_length, offset, length = y[:, 0:1], y[:, 1:2], y[:, 2:3]
        artist, genre = y[:, 3:4], y[:, 4:]

        artist_emb = jnp.take(params["artist_emb"]["emb"]["weight"], artist, axis=0)
        mask = (genre >= 0).astype(jnp.float32)[..., None]
        genre_emb = jnp.take(params["bow_genre_emb"]["emb"]["weight"],
                             jnp.clip(genre, 0, None), axis=0)
        genre_emb = jnp.sum(genre_emb * mask, axis=1, keepdims=True)
        start_emb = genre_emb + artist_emb

        pos_emb = None
        if self.include_time_signal:
            embs = self._t_embs
            start, end = offset.astype(jnp.float32), (offset + length).astype(jnp.float32)
            total = total_length.astype(jnp.float32)
            pos_emb = (
                embs["total_length_emb"].apply(params["total_length_emb"], total)
                + embs["absolute_pos_emb"].apply(params["absolute_pos_emb"], start, end)
                + embs["relative_pos_emb"].apply(params["relative_pos_emb"],
                                                 start / total, end / total)
            )
        return start_emb, pos_emb
