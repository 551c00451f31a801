"""Hierarchical VQ-VAE (TPU equivalent of jukebox/vqvae/vqvae.py).

Per-level independent encoders/decoders over feature-last audio [N, T, 1],
EMA k-means bottleneck, and the reference's loss mix: recons (l1/l2/linf/
lmix) normalised by dataset bandwidth + spectral + multispectral + commit
(vqvae.py:150-228). The whole training forward is one jittable function of
(params, codebook state, batch, rng).
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from jukebox_tpu.models.bottleneck import Bottleneck, NoBottleneck
from jukebox_tpu.models.encdec import BlockCfg, Decoder, Encoder
from jukebox_tpu.ops.stft import multispectral_loss, spectral_convergence, spectral_loss


def calculate_strides(strides, downs):
    return [stride ** down for stride, down in zip(strides, downs)]


def _loss_fn(loss_fn, x_target, x_pred, hps):
    """Reconstruction losses normalised by dataset bandwidth
    (vqvae.py:21-40)."""
    if loss_fn == "l1":
        return jnp.mean(jnp.abs(x_pred - x_target)) / hps.bandwidth["l1"]
    elif loss_fn == "l2":
        return jnp.mean(jnp.square(x_pred - x_target)) / hps.bandwidth["l2"]
    elif loss_fn == "linf":
        residual = jnp.square(x_pred - x_target).reshape(x_target.shape[0], -1)
        values, _ = lax.top_k(residual, min(hps.linf_k, residual.shape[-1]))
        return jnp.mean(values) / hps.bandwidth["l2"]
    elif loss_fn == "lmix":
        loss = 0.0
        if hps.lmix_l1:
            loss += hps.lmix_l1 * _loss_fn("l1", x_target, x_pred, hps)
        if hps.lmix_l2:
            loss += hps.lmix_l2 * _loss_fn("l2", x_target, x_pred, hps)
        if hps.lmix_linf:
            loss += hps.lmix_linf * _loss_fn("linf", x_target, x_pred, hps)
        return loss
    else:
        raise ValueError(f"Unknown loss_fn {loss_fn}")


def average_metrics(_metrics):
    """Average a list of per-level metric dicts (utils/logger.py equivalent)."""
    metrics = {}
    for _metric in _metrics:
        for key, val in _metric.items():
            metrics.setdefault(key, []).append(val)
    return {key: sum(vals) / len(vals) for key, vals in metrics.items()}


@dataclass(frozen=True)
class VQVAE:
    input_shape: Tuple[int, int]  # (T, channels)
    levels: int
    downs_t: Tuple[int, ...]
    strides_t: Tuple[int, ...]
    emb_width: int
    l_bins: int
    mu: float
    commit: float
    spectral: float
    multispectral: float
    multipliers: Optional[Tuple[int, ...]] = None
    use_bottleneck: bool = True
    block: BlockCfg = BlockCfg()

    # -- derived -------------------------------------------------------------

    @property
    def sample_length(self):
        return self.input_shape[0]

    @property
    def x_channels(self):
        return self.input_shape[-1]

    @property
    def downsamples(self):
        return calculate_strides(self.strides_t, self.downs_t)

    @property
    def hop_lengths(self):
        return np.cumprod(self.downsamples)

    @property
    def z_shapes(self):
        return [(self.input_shape[0] // int(self.hop_lengths[level]),)
                for level in range(self.levels)]

    def _multiplier(self, level):
        if self.multipliers is None:
            return 1
        assert len(self.multipliers) == self.levels, "Invalid number of multipliers"
        return self.multipliers[level]

    def _block_cfg(self, level):
        m = self._multiplier(level)
        b = self.block
        return BlockCfg(width=b.width * m, depth=b.depth * m, m_conv=b.m_conv,
                        dilation_growth_rate=b.dilation_growth_rate,
                        dilation_cycle=b.dilation_cycle, zero_out=b.zero_out,
                        res_scale=b.res_scale,
                        reverse_decoder_dilation=b.reverse_decoder_dilation,
                        checkpoint_res=b.checkpoint_res)

    def encoder(self, level):
        return Encoder(self.x_channels, self.emb_width, level + 1,
                       self.downs_t[:level + 1], self.strides_t[:level + 1],
                       self._block_cfg(level))

    def decoder(self, level):
        return Decoder(self.x_channels, self.emb_width, level + 1,
                       self.downs_t[:level + 1], self.strides_t[:level + 1],
                       self._block_cfg(level))

    @property
    def bottleneck(self):
        if self.use_bottleneck:
            return Bottleneck(self.l_bins, self.emb_width, self.mu, self.levels)
        return NoBottleneck(self.levels)

    # -- params / state ------------------------------------------------------

    def init(self, rng):
        rngs = jax.random.split(rng, 2 * self.levels)
        return {
            "encoders": [self.encoder(l).init(rngs[2 * l]) for l in range(self.levels)],
            "decoders": [self.decoder(l).init(rngs[2 * l + 1]) for l in range(self.levels)],
        }

    def init_state(self):
        return self.bottleneck.init_state()

    # -- inference -----------------------------------------------------------

    def encode(self, params, state, x, start_level=0, end_level=None):
        """x: [N, T, C] in [-1, 1] -> list of code arrays [N, T/hop]."""
        if end_level is None:
            end_level = self.levels
        xs = [self.encoder(level).apply(params["encoders"][level], x)[-1]
              for level in range(self.levels)]
        zs = self.bottleneck.encode(state, xs)
        return zs[start_level:end_level]

    def decode(self, params, state, zs, start_level=0, end_level=None):
        """Decode from the deepest provided level only (vqvae.py:101-113)."""
        if end_level is None:
            end_level = self.levels
        assert len(zs) == end_level - start_level
        xs_quantised = self.bottleneck.decode(state, zs, start_level=start_level,
                                              end_level=end_level)
        x_out = self.decoder(start_level).apply(
            params["decoders"][start_level], xs_quantised[0:1], all_levels=False)
        return x_out

    def sample(self, params, state, n_samples, rng):
        zs = [jax.random.randint(jax.random.fold_in(rng, level), (n_samples, *z_shape),
                                 0, self.l_bins)
              for level, z_shape in enumerate(self.z_shapes)]
        return self.decode(params, state, zs[0:1], start_level=0, end_level=1)

    # -- training forward ----------------------------------------------------

    def forward(self, params, state, x, hps, loss_fn="l1", train=False, rng=None):
        """Full multi-level training forward (vqvae.py:150-228).

        Returns (x_out, loss, metrics, new_state).
        """
        metrics = {}
        x_in = x.astype(jnp.float32)

        xs = [self.encoder(level).apply(params["encoders"][level], x_in)[-1]
              for level in range(self.levels)]

        zs, xs_quantised, commit_losses, quantiser_metrics, state = \
            self.bottleneck.forward(state, xs, update_k=train, rng=rng)

        x_outs = [self.decoder(level).apply(params["decoders"][level],
                                            xs_quantised[level:level + 1],
                                            all_levels=False)
                  for level in range(self.levels)]

        def _spectral_loss(x_target, x_out):
            if hps.use_nonrelative_specloss:
                sl = spectral_loss(x_target, x_out, hps) / hps.bandwidth["spec"]
            else:
                sl = spectral_convergence(x_target, x_out, hps)
            return jnp.mean(sl)

        def _multispectral_loss(x_target, x_out):
            return jnp.mean(multispectral_loss(x_target, x_out, hps) / hps.bandwidth["spec"])

        recons_loss = jnp.zeros(())
        spec_loss = jnp.zeros(())
        multispec_loss = jnp.zeros(())
        x_target = x_in

        for level in reversed(range(self.levels)):
            x_out = x_outs[level]
            this_recons_loss = _loss_fn(loss_fn, x_target, x_out, hps)
            this_spec_loss = _spectral_loss(x_target, x_out)
            this_multispec_loss = _multispectral_loss(x_target, x_out)
            metrics[f"recons_loss_l{level + 1}"] = this_recons_loss
            metrics[f"spectral_loss_l{level + 1}"] = this_spec_loss
            metrics[f"multispectral_loss_l{level + 1}"] = this_multispec_loss
            recons_loss += this_recons_loss
            spec_loss += this_spec_loss
            multispec_loss += this_multispec_loss

        commit_loss = sum(commit_losses)
        loss = (recons_loss + self.spectral * spec_loss
                + self.multispectral * multispec_loss + self.commit * commit_loss)

        x_out = x_outs[0]  # level-0 recon, the last one the loop touched
        sc = lax.stop_gradient(jnp.mean(spectral_convergence(x_target, x_out, hps)))
        l2_loss = lax.stop_gradient(_loss_fn("l2", x_target, x_out, hps))
        l1_loss = lax.stop_gradient(_loss_fn("l1", x_target, x_out, hps))
        linf_loss = lax.stop_gradient(_loss_fn("linf", x_target, x_out, hps))

        metrics.update(dict(
            recons_loss=recons_loss,
            spectral_loss=spec_loss,
            multispectral_loss=multispec_loss,
            spectral_convergence=sc,
            l2_loss=l2_loss,
            l1_loss=l1_loss,
            linf_loss=linf_loss,
            commit_loss=commit_loss,
            **average_metrics(quantiser_metrics)))

        metrics = {k: lax.stop_gradient(v) for k, v in metrics.items()}
        return x_out, loss, metrics, state
