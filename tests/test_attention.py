"""Factored-attention correctness oracles, mirroring the reference's
executable self-checks:

  * gradient-based mask property test (factored_attention.py:383-410):
    the gradient of one output position must be nonzero exactly on the
    positions each attn_func may attend to.
  * cached incremental decode == full parallel forward (check_sample, :424-455)
  * chunked prefill == full forward (check_chunks, :457-488)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jukebox_tpu.models.attention import FactoredAttention

N_IN, N_STATE, N_HEAD = 16, 32, 4
N_CTX, BLOCKS = 64, 8
BC = N_CTX // BLOCKS
SPREAD = 2
PRIME_LEN = 8


def make_attn(attn_func, n_ctx=N_CTX):
    encoder_dims = 16 if attn_func == 6 else None
    return FactoredAttention(
        n_in=N_IN, n_ctx=n_ctx, n_state=N_STATE, n_head=N_HEAD,
        attn_func=attn_func, blocks=BLOCKS, spread=SPREAD,
        encoder_dims=encoder_dims, prime_len=PRIME_LEN, mask=True)


def setup(attn_func, seed=0):
    attn = make_attn(attn_func)
    params = attn.init(jax.random.key(seed))
    x = jax.random.normal(jax.random.key(seed + 1), (4, N_CTX, N_IN))
    enc = (jax.random.normal(jax.random.key(seed + 2), (4, attn.encoder_dims, N_IN))
           if attn_func == 6 else None)
    return attn, params, x, enc


@pytest.mark.parametrize("attn_func", [0, 1, 2, 3, 4, 5])
def test_mask_gradient_property(attn_func):
    """Positions reachable through attention must match the reference's
    expected sets (factored_attention.py:398-410)."""
    attn, params, x, _ = setup(attn_func)
    pos = 28  # inside block 3 of 8

    def out_at(x):
        y, _ = attn.apply(params, x)
        return jnp.mean(y[2, pos])

    grad = jax.grad(out_at)(x)
    grad = np.asarray(grad)
    assert (grad[:2] == 0).all() and (grad[3:] == 0).all()
    assert (grad[2, pos + 1:] == 0).all()
    pos_grad = np.nonzero((grad[2] ** 2).sum(-1) > 0)[0]

    block_pos = pos - (pos % BC)
    exp = {
        0: np.arange(pos),
        1: np.arange(block_pos, pos),
        2: np.arange(pos % BC, pos, BC),
        3: np.arange(block_pos - BC, block_pos),
        4: np.arange(BC - 1, pos, BC),
        5: np.nonzero((np.arange(pos) % BC >= BC - SPREAD)
                      & (np.arange(pos) < block_pos))[0],
    }[attn_func]
    exp = np.concatenate([exp, [pos]])
    np.testing.assert_array_equal(pos_grad, exp)


@pytest.mark.parametrize("attn_func", [0, 1, 2, 3, 4, 6, 7])
def test_decode_matches_full_forward(attn_func):
    """Token-by-token cached decode equals the parallel forward
    (reference check_sample tolerance 1e-8 in fp64; we run fp32)."""
    attn, params, x, enc = setup(attn_func)
    y_full, _ = attn.apply(params, x, encoder_kv=enc)

    cache = attn.init_cache(params, bs=4, dtype=jnp.float32, encoder_kv=enc)
    outs = []
    step = jax.jit(attn.decode_step)  # t passed traced: one compile total
    for t in range(N_CTX):
        o, cache = step(params, cache, x[:, t:t + 1], jnp.int32(t),
                        **({"encoder_kv": enc} if attn_func == 6 else {}))
        outs.append(o)
    y_dec = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_dec), np.asarray(y_full), atol=2e-5)


@pytest.mark.parametrize("attn_func", [0, 1, 2, 3, 4, 6, 7])
@pytest.mark.parametrize("n_chunk_blocks", [1, 2])
def test_prefill_matches_full_forward(attn_func, n_chunk_blocks):
    """Block-aligned chunked prefill + single-token tail equals the parallel
    forward (reference check_chunks tolerance 1e-6)."""
    attn, params, x, enc = setup(attn_func)
    y_full, _ = attn.apply(params, x, encoder_kv=enc)

    cache = attn.init_cache(params, bs=4, dtype=jnp.float32, encoder_kv=enc)
    chunk = n_chunk_blocks * BC
    # prefill 3/4 of the context in chunks, decode the rest token by token
    prefill_len = (3 * N_CTX // 4 // chunk) * chunk
    outs = []
    kw = {"encoder_kv": enc} if attn_func == 6 else {}
    prefill = jax.jit(attn.prefill_chunk, static_argnames=("n_blocks",))
    step = jax.jit(attn.decode_step)
    for t0 in range(0, prefill_len, chunk):
        o, cache = prefill(params, cache, x[:, t0:t0 + chunk], jnp.int32(t0),
                           n_blocks=n_chunk_blocks, **kw)
        outs.append(o)
    for t in range(prefill_len, N_CTX):
        o, cache = step(params, cache, x[:, t:t + 1], jnp.int32(t), **kw)
        outs.append(o)
    y_dec = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_dec), np.asarray(y_full), atol=2e-5)


def test_prime_record_attn_shape():
    attn, params, x, _ = setup(7)
    y, w = attn.apply(params, x, record=True)
    # music queries x lyric keys (factored_attention.py:101-105)
    assert w.shape == (4, N_HEAD, N_CTX - PRIME_LEN, PRIME_LEN)
