"""Sampling/forward logit-equivalence oracles for the autoregressive prior,
mirroring the reference's check_sample/test_prior grid
(prior/autoregressive.py:361-421): logits produced during ancestral and
primed (chunked and unchunked) sampling must equal the teacher-forced
forward's logits on the sampled tokens."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jukebox_tpu.models.autoregressive import ConditionalAutoregressive2D

BINS, WIDTH, DEPTH, HEADS, BLOCKS = 16, 32, 2, 2, 8
INPUT_DIMS = 32
ENC_DIMS = 8
BS = 4


def make_prior(attn_order, x_cond, y_cond):
    return ConditionalAutoregressive2D(
        input_shape=(INPUT_DIMS,), bins=BINS, width=WIDTH, depth=DEPTH,
        heads=HEADS, attn_order=attn_order, blocks=BLOCKS,
        x_cond=x_cond, y_cond=y_cond,
        encoder_dims=ENC_DIMS, prime_len=ENC_DIMS)


def conds(prior, rng):
    r1, r2, r3 = jax.random.split(rng, 3)
    y_cond = (jax.random.normal(r1, (BS, 1, WIDTH)) if prior.y_cond else None)
    x_cond = (jax.random.normal(r2, (BS, INPUT_DIMS, WIDTH)) if prior.x_cond else None)
    encoder_kv = jax.random.normal(r3, (BS, ENC_DIMS, WIDTH))
    return x_cond, y_cond, encoder_kv


@pytest.mark.parametrize("attn_order", [0, 2, 6, 12])
@pytest.mark.parametrize("x_cond,y_cond", [(False, False), (True, True)])
def test_sample_logits_match_forward(attn_order, x_cond, y_cond):
    prior = make_prior(attn_order, x_cond, y_cond)
    params = prior.init(jax.random.key(0))
    xc, yc, enc = conds(prior, jax.random.key(1))
    enc = enc if attn_order == 6 else None

    x, preds_sample = prior.sample(params, BS, jax.random.key(2), x_cond=xc,
                                   y_cond=yc, encoder_kv=enc, get_preds=True)
    assert x.shape == (BS, INPUT_DIMS)
    _, preds_forw = prior.forward(params, x, x_cond=xc, y_cond=yc,
                                  encoder_kv=enc, get_preds=True)
    np.testing.assert_allclose(np.asarray(preds_sample), np.asarray(preds_forw),
                               atol=2e-4)


@pytest.mark.parametrize("attn_order", [0, 2, 6])
@pytest.mark.parametrize("chunk_size", [None, 8, 23])
def test_primed_sample_matches_forward(attn_order, chunk_size):
    prior = make_prior(attn_order, x_cond=True, y_cond=True)
    params = prior.init(jax.random.key(0))
    xc, yc, enc = conds(prior, jax.random.key(1))
    enc = enc if attn_order == 6 else None
    prime = INPUT_DIMS // 8 * 7

    x_full, _ = prior.sample(params, BS, jax.random.key(2), x_cond=xc, y_cond=yc,
                             encoder_kv=enc, get_preds=True)
    x_prime = x_full[:, :prime]

    x, preds_sample = prior.primed_sample(params, BS, x_prime, jax.random.key(3),
                                          x_cond=xc, y_cond=yc, encoder_kv=enc,
                                          get_preds=True, chunk_size=chunk_size)
    np.testing.assert_array_equal(np.asarray(x[:, :prime]), np.asarray(x_prime))
    _, preds_forw = prior.forward(params, x, x_cond=xc, y_cond=yc,
                                  encoder_kv=enc, get_preds=True)
    np.testing.assert_allclose(np.asarray(preds_sample), np.asarray(preds_forw),
                               atol=2e-4)


def test_sep_loss_split():
    prior = ConditionalAutoregressive2D(
        input_shape=(INPUT_DIMS,), bins=BINS, width=WIDTH, depth=DEPTH,
        heads=HEADS, attn_order=2, blocks=BLOCKS, prime_len=8)
    params = prior.init(jax.random.key(0))
    x = jax.random.randint(jax.random.key(1), (BS, INPUT_DIMS), 0, BINS)
    (prime_loss, gen_loss), _ = prior.forward(params, x, get_sep_loss=True)
    full_loss, _ = prior.forward(params, x)
    # full loss is the token-weighted mean of the two pieces
    approx = (prime_loss * 8 + gen_loss * (INPUT_DIMS - 8)) / INPUT_DIMS
    np.testing.assert_allclose(float(full_loss), float(approx), rtol=1e-5)


def test_merged_decoder_untied_embeddings():
    prior = ConditionalAutoregressive2D(
        input_shape=(INPUT_DIMS,), bins=BINS, width=WIDTH, depth=DEPTH,
        heads=HEADS, attn_order=2, blocks=BLOCKS, merged_decoder=True)
    params = prior.init(jax.random.key(0))
    assert "x_out" in params  # untied output head (autoregressive.py:87-98)
    assert not prior.add_cond_after_transformer
