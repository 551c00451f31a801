"""STFT and spectral losses matching the reference's torch.stft usage
(jukebox/utils/audio_utils.py:82-132).

torch.stft (torch 1.4 defaults used by the reference): center=True with
reflect padding of n_fft//2, periodic Hann window of win_length centered in
an n_fft frame, hop_length stride, one-sided spectrum. We reproduce those
semantics exactly with framing + rfft so spectral losses are numerically
comparable with the reference.
"""

from dataclasses import dataclass
from functools import partial

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class STFTParams:
    n_fft: int
    hop_length: int
    window_size: int


# Default spectral-loss STFT (reference audio_utils.py:8-13)
def default_stft(sr=None):
    return STFTParams(n_fft=2048, hop_length=256, window_size=6 * 256)


def _hann_window(window_size, n_fft):
    # periodic Hann, zero-padded and centered in the n_fft frame like torch.stft
    n = np.arange(window_size)
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / window_size))
    left = (n_fft - window_size) // 2
    padded = np.zeros(n_fft, dtype=np.float32)
    padded[left:left + window_size] = win
    return jnp.asarray(padded)


def stft_mag(x, p: STFTParams):
    """Magnitude spectrogram |STFT(x)|.

    x: [N, T] float. Returns [N, n_fft//2 + 1, n_frames] matching torch's
    (freq, frames) layout with n_frames = 1 + T // hop_length.
    """
    n_fft, hop = p.n_fft, p.hop_length
    x = x.astype(jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    window = _hann_window(p.window_size, n_fft)

    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[:, idx] * window  # [N, n_frames, n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.abs(spec)  # [N, n_frames, freq]
    return jnp.transpose(mag, (0, 2, 1))


def _squeeze(x):
    """NTC (C in {1,2}) -> NT by channel mean (reference audio_utils.py:91-97)."""
    if x.ndim == 3:
        assert x.shape[-1] in (1, 2)
        x = jnp.mean(x, axis=-1)
    assert x.ndim == 2, f"Unknown input shape {x.shape}"
    return x


def _norm(x):
    return jnp.sqrt(jnp.sum(jnp.square(x.reshape(x.shape[0], -1)), axis=-1))


def spectral_loss(x_in, x_out, hps):
    """Per-sample L2 norm of the magnitude-spectrogram difference
    (reference audio_utils.py:99-103)."""
    p = STFTParams(2048, 256, 6 * 256)
    spec_in = stft_mag(_squeeze(x_in), p)
    spec_out = stft_mag(_squeeze(x_out), p)
    return _norm(spec_in - spec_out)


def multispectral_loss(x_in, x_out, hps):
    """Mean of spectral losses over the multiscale STFT bank
    (reference audio_utils.py:105-116)."""
    losses = []
    assert len(hps.multispec_loss_n_fft) == len(hps.multispec_loss_hop_length) \
        == len(hps.multispec_loss_window_size)
    for n_fft, hop, win in zip(hps.multispec_loss_n_fft,
                               hps.multispec_loss_hop_length,
                               hps.multispec_loss_window_size):
        p = STFTParams(n_fft, hop, win)
        spec_in = stft_mag(_squeeze(x_in), p)
        spec_out = stft_mag(_squeeze(x_out), p)
        losses.append(_norm(spec_in - spec_out))
    return sum(losses) / len(losses)


def spectral_convergence(x_in, x_out, hps, epsilon=2e-3):
    """Residual norm over reference norm (reference audio_utils.py:118-126)."""
    p = STFTParams(2048, 256, 6 * 256)
    spec_in = stft_mag(_squeeze(x_in), p)
    spec_out = stft_mag(_squeeze(x_out), p)
    gt_norm = _norm(spec_in)
    residual_norm = _norm(spec_in - spec_out)
    mask = (gt_norm > epsilon).astype(jnp.float32)
    return (residual_norm * mask) / jnp.clip(gt_norm, min=epsilon)


def log_magnitude_loss(x_in, x_out, hps, epsilon=1e-4):
    p = STFTParams(2048, 256, 6 * 256)
    spec_in = jnp.log(stft_mag(_squeeze(x_in), p) + epsilon)
    spec_out = jnp.log(stft_mag(_squeeze(x_out), p) + epsilon)
    return jnp.mean(jnp.abs(spec_in - spec_out))
