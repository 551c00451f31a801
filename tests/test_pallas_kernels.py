"""Pallas kernel correctness in interpret mode (runs on CPU; the same code
compiles for TPU via Mosaic). Each kernel is verified against its pure-XLA
counterpart, including custom VJPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jukebox_tpu.ops.core import layer_norm, layer_norm_init
from jukebox_tpu.ops.pallas.adam import adam_update_pallas
from jukebox_tpu.ops.pallas.layer_norm import layer_norm_pallas
from jukebox_tpu.utils.train_utils import adam_init, adam_update


def test_layer_norm_pallas_forward():
    D = 128
    p = layer_norm_init(D)
    g = jnp.asarray(np.random.RandomState(0).randn(D).astype(np.float32))
    b = jnp.asarray(np.random.RandomState(1).randn(D).astype(np.float32))
    x = jnp.asarray(np.random.RandomState(2).randn(4, 64, D).astype(np.float32))
    ref = layer_norm({"g": g, "b": b}, x)
    out = layer_norm_pallas(x, g, b, 1e-5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_layer_norm_pallas_grad():
    D = 128
    g = jnp.asarray(np.random.RandomState(0).randn(D).astype(np.float32))
    b = jnp.asarray(np.random.RandomState(1).randn(D).astype(np.float32))
    x = jnp.asarray(np.random.RandomState(2).randn(8, D).astype(np.float32))

    def ref_loss(x, g, b):
        return jnp.sum(jnp.sin(layer_norm({"g": g, "b": b}, x)))

    def pal_loss(x, g, b):
        return jnp.sum(jnp.sin(layer_norm_pallas(x, g, b, 1e-5, True)))

    rx, rg, rb = jax.grad(ref_loss, argnums=(0, 1, 2))(x, g, b)
    px, pg, pb = jax.grad(pal_loss, argnums=(0, 1, 2))(x, g, b)
    np.testing.assert_allclose(np.asarray(px), np.asarray(rx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pg), np.asarray(rg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(rb), atol=1e-4)


def test_adam_pallas_matches_xla():
    rs = np.random.RandomState(0)
    params = {"a": jnp.asarray(rs.randn(40, 30).astype(np.float32)),
              "b": jnp.asarray(rs.randn(17).astype(np.float32))}
    grads = {"a": jnp.asarray(rs.randn(40, 30).astype(np.float32)),
             "b": jnp.asarray(rs.randn(17).astype(np.float32))}
    opt1 = adam_init(params)
    opt2 = adam_init(params)
    kw = dict(lr=1e-3, beta1=0.9, beta2=0.99, eps=1e-8, weight_decay=0.01,
              scale=2.0)
    p1, o1 = params, opt1
    p2, o2 = params, opt2
    for _ in range(3):
        p1, o1 = adam_update(p1, grads, o1, **kw)
        p2, o2 = adam_update_pallas(p2, grads, o2, **kw, interpret=True)
    for k in params:
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(p1[k]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(o2["m"][k]), np.asarray(o1["m"][k]),
                                   atol=1e-6)


@pytest.mark.parametrize("B,L,S,H,dtype", [
    (2, 256, 128, 2, "float32"),
    (1, 384, 256, 2, "float32"),   # L not a block multiple (padding path)
    (2, 256, 96, 1, "bfloat16"),   # head dim needs lane padding (96 -> 128)
])
def test_flash_dense_attn_matches_dense(B, L, S, H, dtype):
    from jukebox_tpu.models.attention import _causal_mask, dense_attn
    from jukebox_tpu.ops.pallas.flash_attention import flash_dense_attn

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, L, S), dtype)
    k = jnp.asarray(rs.randn(B, L, S), dtype)
    v = jnp.asarray(rs.randn(B, L, S), dtype)
    ref, _ = dense_attn(q, k, v, H, _causal_mask(L, L, 0))
    out = flash_dense_attn(q, k, v, H, bq=128, bk=128, interpret=True)
    atol = 2e-2 if dtype == "bfloat16" else 2e-5
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=atol)


def test_flash_dense_attn_causality():
    """Changing future K/V must not change past outputs (the gradient-based
    mask property of FactoredAttention.check, factored_attention.py:383-410,
    checked via perturbation)."""
    from jukebox_tpu.ops.pallas.flash_attention import flash_dense_attn

    rs = np.random.RandomState(1)
    B, L, S, H = 1, 256, 128, 2
    q = jnp.asarray(rs.randn(B, L, S), jnp.float32)
    k = jnp.asarray(rs.randn(B, L, S), jnp.float32)
    v = jnp.asarray(rs.randn(B, L, S), jnp.float32)
    out1 = flash_dense_attn(q, k, v, H, bq=128, bk=128, interpret=True)
    k2 = k.at[:, 200:].add(100.0)
    v2 = v.at[:, 200:].add(-50.0)
    out2 = flash_dense_attn(q, k2, v2, H, bq=128, bk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out1[:, :200]),
                               np.asarray(out2[:, :200]), atol=1e-6)
    assert np.abs(np.asarray(out1[:, 200:]) - np.asarray(out2[:, 200:])).max() > 1e-3


def test_flash_dense_attn_grads_match_dense():
    from jukebox_tpu.models.attention import _causal_mask, dense_attn
    from jukebox_tpu.ops.pallas.flash_attention import flash_dense_attn

    rs = np.random.RandomState(3)
    B, L, S, H = 1, 384, 128, 2  # non-multiple L exercises padded grads
    q = jnp.asarray(rs.randn(B, L, S), jnp.float32)
    k = jnp.asarray(rs.randn(B, L, S), jnp.float32)
    v = jnp.asarray(rs.randn(B, L, S), jnp.float32)

    def ref_loss(q, k, v):
        out, _ = dense_attn(q, k, v, H, _causal_mask(L, L, 0))
        return jnp.sum(jnp.sin(out))

    def pal_loss(q, k, v):
        out = flash_dense_attn(q, k, v, H, bq=128, bk=128, interpret=True)
        return jnp.sum(jnp.sin(out))

    ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    pal = jax.grad(pal_loss, argnums=(0, 1, 2))(q, k, v)
    for r, p, name in zip(ref, pal, "qkv"):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=2e-4,
                                   err_msg=f"d{name}")
