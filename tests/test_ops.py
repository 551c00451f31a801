"""Unit tests for core ops, including numerical parity against torch CPU
(the same library the reference uses) for conv/STFT/logit-filter semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from jukebox_tpu.hparams import Hyperparams
from jukebox_tpu.ops import (
    conv1d,
    conv1d_init,
    conv_transpose1d,
    conv_transpose1d_init,
    dense,
    dense_init,
    filter_logits,
    layer_norm,
    layer_norm_init,
    quick_gelu,
)
from jukebox_tpu.ops.stft import STFTParams, multispectral_loss, spectral_loss, stft_mag


def test_dense_matches_addmm():
    rng = jax.random.key(0)
    p = dense_init(rng, 8, 16, init_scale=0.5)
    x = jax.random.normal(jax.random.key(1), (2, 4, 8))
    y = dense(p, x)
    expect = np.asarray(x) @ np.asarray(p["w"]) + np.asarray(p["b"])
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)


def test_layer_norm_matches_torch():
    p = layer_norm_init(16)
    x = np.random.RandomState(0).randn(3, 5, 16).astype(np.float32)
    y = layer_norm(p, jnp.asarray(x))
    expect = F.layer_norm(torch.from_numpy(x), (16,)).numpy()
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)


def test_quick_gelu_matches_reference_formula():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    y = quick_gelu(jnp.asarray(x))
    tx = torch.from_numpy(x)
    expect = (tx * torch.sigmoid(1.702 * tx)).numpy()
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-6)


@pytest.mark.parametrize("stride,padding,dilation,kernel", [
    (1, 1, 1, 3), (2, 1, 1, 4), (1, 3, 3, 3), (1, 9, 9, 3),
])
def test_conv1d_matches_torch(stride, padding, dilation, kernel):
    n_in, n_out, T = 5, 7, 64
    rs = np.random.RandomState(0)
    w = rs.randn(kernel, n_in, n_out).astype(np.float32) * 0.1
    b = rs.randn(n_out).astype(np.float32)
    x = rs.randn(2, T, n_in).astype(np.float32)

    y = conv1d({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x),
               stride=stride, padding=padding, dilation=dilation)

    tw = torch.from_numpy(w).permute(2, 1, 0)  # (out, in, k)
    expect = F.conv1d(torch.from_numpy(x).permute(0, 2, 1), tw, torch.from_numpy(b),
                      stride=stride, padding=padding, dilation=dilation)
    expect = expect.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-4)


@pytest.mark.parametrize("stride", [2])
def test_conv_transpose1d_matches_torch(stride):
    # Reference decoder uses filter=2*stride, pad=stride//2 (encdec.py:34)
    kernel, padding = stride * 2, stride // 2
    n_in, n_out, T = 6, 4, 32
    rs = np.random.RandomState(1)
    w = rs.randn(kernel, n_in, n_out).astype(np.float32) * 0.1
    b = rs.randn(n_out).astype(np.float32)
    x = rs.randn(2, T, n_in).astype(np.float32)

    y = conv_transpose1d({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x),
                         stride=stride, padding=padding)

    tw = torch.from_numpy(w).permute(1, 2, 0)  # (in, out, k)
    expect = F.conv_transpose1d(torch.from_numpy(x).permute(0, 2, 1), tw,
                                torch.from_numpy(b), stride=stride, padding=padding)
    expect = expect.permute(0, 2, 1).numpy()
    assert y.shape == expect.shape == (2, T * stride, n_out)
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-4)


@pytest.mark.parametrize("n_fft,hop,win", [(2048, 256, 1536), (1024, 120, 600), (512, 50, 240)])
def test_stft_matches_torch(n_fft, hop, win):
    T = 8192
    x = np.random.RandomState(2).randn(2, T).astype(np.float32)
    mag = stft_mag(jnp.asarray(x), STFTParams(n_fft, hop, win))

    spec = torch.stft(torch.from_numpy(x), n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), return_complex=True)
    expect = spec.abs().numpy()
    assert mag.shape == expect.shape
    np.testing.assert_allclose(np.asarray(mag), expect, atol=2e-2, rtol=1e-4)


def test_spectral_losses_nonnegative_and_zero_on_identity():
    hps = Hyperparams(
        multispec_loss_n_fft=(2048, 1024, 512),
        multispec_loss_hop_length=(240, 120, 50),
        multispec_loss_window_size=(1200, 600, 240),
    )
    x = jnp.asarray(np.random.RandomState(3).randn(2, 4096, 1).astype(np.float32))
    assert np.allclose(spectral_loss(x, x, hps), 0.0, atol=1e-3)
    assert np.allclose(multispectral_loss(x, x, hps), 0.0, atol=1e-3)
    y = x + 0.1
    assert np.all(np.asarray(spectral_loss(x, y, hps)) >= 0)


def _torch_filter_logits(logits, top_k=0, top_p=0.0, filter_value=-1e10):
    # Reference implementation semantics (transformer/ops.py:113-142)
    logits = torch.from_numpy(np.array(logits)).clone()
    if top_k > 0:
        indices_to_remove = logits < torch.topk(logits, top_k, dim=-1)[0][..., -1:]
        logits[indices_to_remove] = filter_value
    if top_p > 0.0:
        sorted_logits, sorted_indices = torch.sort(logits, descending=True, dim=-1)
        cumulative_probs = torch.cumsum(F.softmax(sorted_logits, dim=-1), dim=-1)
        sorted_indices_to_remove = cumulative_probs > top_p
        sorted_indices_to_remove[..., 1:] = sorted_indices_to_remove[..., :-1].clone()
        sorted_indices_to_remove[..., 0] = 0
        indices_to_remove = torch.zeros_like(logits, dtype=torch.bool).scatter_(
            dim=-1, index=sorted_indices, src=sorted_indices_to_remove)
        logits[indices_to_remove] = filter_value
    return logits.numpy()


@pytest.mark.parametrize("top_k,top_p", [(0, 0.0), (5, 0.0), (1, 0.0), (0, 0.9), (0, 0.5)])
def test_filter_logits_matches_reference(top_k, top_p):
    logits = np.random.RandomState(4).randn(3, 1, 64).astype(np.float32)
    ours = np.asarray(filter_logits(jnp.asarray(logits), top_k=top_k, top_p=top_p))
    expect = _torch_filter_logits(logits, top_k=top_k, top_p=top_p)
    np.testing.assert_allclose(ours, expect, atol=1e-5)
