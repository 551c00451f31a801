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


# --- flash attention with in-kernel dropout ----------------------------------

def _np_keep_mask(seed, bh, Lq, Lk, rate):
    """Host mirror of flash_attention._keep_mask (murmur3 finalizer over
    global positions); proves the kernel's recomputed mask is the advertised
    deterministic function of (seed, head, positions)."""
    with np.errstate(over="ignore"):
        q_pos = np.arange(Lq, dtype=np.uint32)[:, None] * np.uint32(0x9E3779B1)
        kv_pos = np.arange(Lk, dtype=np.uint32)[None, :] * np.uint32(0x85EBCA77)
        s = np.uint32(seed) + np.uint32(bh) * np.uint32(0xC2B2AE3D)
        h = q_pos ^ kv_pos ^ s
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    thresh = np.uint32(min(int(rate * 4294967296.0), 4294967295))
    return h >= thresh


def _masked_dense_ref(q, k, v, keep, H, rate):
    """dense_attn + the reference's post-softmax dropout with an explicit
    keep mask (factored_attention.py:106 semantics)."""
    B, L, S = q.shape
    hd = S // H
    qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3).astype(jnp.float32)
    kh = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3).astype(jnp.float32)
    vh = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3).astype(jnp.float32)
    w = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
    tril = np.tril(np.ones((L, L), bool))
    w = jnp.where(tril, w, -1e9)
    w = jax.nn.softmax(w, axis=-1)
    w = jnp.where(keep, w / (1.0 - rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, L, S).astype(q.dtype)


def _dropout_case(B=1, L=256, S=128, H=2, rate=0.25, seed=1234):
    rs = np.random.RandomState(7)
    q = jnp.asarray(rs.randn(B, L, S), jnp.float32)
    k = jnp.asarray(rs.randn(B, L, S), jnp.float32)
    v = jnp.asarray(rs.randn(B, L, S), jnp.float32)
    keep = np.stack([np.stack([_np_keep_mask(seed, b * H + h, L, L, rate)
                               for h in range(H)]) for b in range(B)])
    return q, k, v, keep, seed


def test_flash_dropout_forward_matches_masked_dense():
    from jukebox_tpu.ops.pallas.flash_attention import flash_dense_attn
    H, rate = 2, 0.25
    q, k, v, keep, seed = _dropout_case(H=H, rate=rate)
    ref = _masked_dense_ref(q, k, v, keep, H, rate)
    out = flash_dense_attn(q, k, v, H, bq=128, bk=128, interpret=True,
                           dropout_rate=rate, dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    # the mask actually drops something
    keep_frac = keep[..., np.tril_indices(256)[0], np.tril_indices(256)[1]].mean()
    assert 0.70 < keep_frac < 0.80  # ~= 1 - rate


def test_flash_dropout_grads_match_masked_dense():
    from jukebox_tpu.ops.pallas.flash_attention import flash_dense_attn
    H, rate = 2, 0.25
    q, k, v, keep, seed = _dropout_case(H=H, rate=rate)

    def ref_loss(q, k, v):
        return jnp.sum(jnp.sin(_masked_dense_ref(q, k, v, keep, H, rate)))

    def pal_loss(q, k, v):
        out = flash_dense_attn(q, k, v, H, bq=128, bk=128, interpret=True,
                               dropout_rate=rate, dropout_seed=seed)
        return jnp.sum(jnp.sin(out))

    ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    pal = jax.grad(pal_loss, argnums=(0, 1, 2))(q, k, v)
    for r, p, name in zip(ref, pal, "qkv"):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=3e-4,
                                   err_msg=f"d{name}")


def test_flash_dropout_deterministic_and_seed_sensitive():
    from jukebox_tpu.ops.pallas.flash_attention import flash_dense_attn
    q, k, v, _, seed = _dropout_case()
    f = lambda s: np.asarray(flash_dense_attn(
        q, k, v, 2, bq=128, bk=128, interpret=True, dropout_rate=0.25,
        dropout_seed=s))
    np.testing.assert_array_equal(f(seed), f(seed))
    assert np.abs(f(seed) - f(seed + 1)).max() > 1e-3


def test_flash_dropout_rate_zero_identical_to_plain():
    from jukebox_tpu.ops.pallas.flash_attention import flash_dense_attn
    q, k, v, _, _ = _dropout_case()
    a = flash_dense_attn(q, k, v, 2, bq=128, bk=128, interpret=True)
    b = flash_dense_attn(q, k, v, 2, bq=128, bk=128, interpret=True,
                         dropout_rate=0.0, dropout_seed=None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flash_dropout_block_size_invariant():
    """The mask hashes GLOBAL positions, so results must not depend on the
    kernel block decomposition."""
    from jukebox_tpu.ops.pallas.flash_attention import flash_dense_attn
    q, k, v, _, seed = _dropout_case(L=256)
    a = flash_dense_attn(q, k, v, 2, bq=128, bk=128, interpret=True,
                         dropout_rate=0.25, dropout_seed=seed)
    b = flash_dense_attn(q, k, v, 2, bq=256, bk=128, interpret=True,
                         dropout_rate=0.25, dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)
