"""Segmented decoding (host loop over fixed-size token segments with carried
caches) must produce EXACTLY the same tokens as the monolithic single-scan
sample — the rng folds on absolute positions, so the stream is invariant to
segmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jukebox_tpu.hparams import setup_hparams
from jukebox_tpu.models.make_models import make_prior, make_vqvae


@pytest.fixture(scope="module")
def vqvae():
    hps = setup_hparams("teeny", dict(
        sample_length=512, sr=8000, levels=2, downs_t=(2, 1), strides_t=(2, 2),
        emb_width=16, l_bins=32, l_mu=0.99, commit=0.02, width=8, depth=1,
        m_conv=1.0, dilation_growth_rate=1))
    return make_vqvae(hps)


def _single_enc_dec_prior(vqvae):
    hps = setup_hparams("teeny", dict(
        sample_length=256, sr=8000, level=1, levels=2, labels=True,
        labels_v3=True, y_bins=(10, 100), max_bow_genre_size=1, t_bins=16,
        min_duration=1.0, max_duration=600.0, use_tokens=True, n_tokens=16,
        n_vocab=79, prime_loss_fraction=0.4, single_enc_dec=True,
        n_ctx=64, prior_width=32, prior_depth=3, heads=2, attn_order=12,
        blocks=8, init_scale=0.7))
    return make_prior(hps, vqvae)


def _upsampler_prior(vqvae):
    hps = setup_hparams("teeny", dict(
        sample_length=256, sr=8000, level=0, levels=2, labels=False,
        n_ctx=64, prior_width=32, prior_depth=3, heads=2, attn_order=2,
        blocks=8, init_scale=0.7, cond_width=16, cond_depth=1,
        cond_dilation_growth_rate=1, cond_dilation_cycle=None,
        min_duration=1.0, max_duration=600.0))
    return make_prior(hps, vqvae)


def _labels(prior, bs):
    metas = [dict(artist="unknown", genre="unknown", lyrics="twinkle twinkle",
                  total_length=8000 * 60, offset=0)] * bs
    return prior.get_y(prior.labeller.get_batch_labels(metas), 0)


@pytest.mark.parametrize("z_len", [0, 32])
def test_single_enc_dec_segmented_matches_monolithic(vqvae, z_len):
    prior = _single_enc_dec_prior(vqvae)
    bs = 2
    y = _labels(prior, bs)
    z = (np.random.RandomState(0).randint(0, 32, (bs, z_len))
         if z_len else None)
    kw = dict(n_samples=bs, z=jnp.asarray(z) if z is not None else None,
              z_conds=None, y=y, rng=jax.random.key(7), fp16=False,
              temp=0.99, chunk_size=8)
    ref = prior.sample(segment_tokens=None, **kw)
    seg = prior.sample(segment_tokens=8, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(seg))
    if z is not None:
        np.testing.assert_array_equal(np.asarray(seg[:, :z_len]), z)


@pytest.mark.parametrize("z_len,sample_tokens", [(0, None), (32, None),
                                                 (16, 48)])
def test_upsampler_segmented_matches_monolithic(vqvae, z_len, sample_tokens):
    prior = _upsampler_prior(vqvae)
    bs = 2
    rs = np.random.RandomState(1)
    z = jnp.asarray(rs.randint(0, 32, (bs, z_len))) if z_len else None
    z_conds = [jnp.asarray(rs.randint(0, 32, (bs, 32)))]
    kw = dict(n_samples=bs, z=z, z_conds=z_conds, y=None,
              rng=jax.random.key(3), fp16=False, temp=0.99, chunk_size=8,
              sample_tokens=sample_tokens)
    ref = prior.sample(segment_tokens=None, **kw)
    seg = prior.sample(segment_tokens=7, **kw)  # uneven segments
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(seg))


def test_staged_decode_matches_unstaged(vqvae):
    """stage_decode (host-stacked transformer params, no raw weights on
    device) must produce the identical token stream."""
    prior = _single_enc_dec_prior(vqvae)
    bs = 2
    y = _labels(prior, bs)
    z = jnp.asarray(np.random.RandomState(2).randint(0, 32, (bs, 32)))
    kw = dict(n_samples=bs, z=z, z_conds=None, y=y, rng=jax.random.key(9),
              fp16=False, temp=0.99, chunk_size=8)
    ref = prior.sample(segment_tokens=8, **kw)
    assert prior._staged_dec is None
    prior.stage_decode()
    assert prior._staged_dec is not None
    staged = prior.sample(segment_tokens=8, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(staged))
    prior.to_host()
    assert prior._staged_dec is None


def test_staged_decode_cross_attn(vqvae):
    """Staged decode with a separate lyric encoder: f6 caches built from the
    stacked segment params (vmapped encoder K/V projections)."""
    hps = setup_hparams("teeny", dict(
        sample_length=256, sr=8000, level=1, levels=2, labels=True,
        labels_v3=True, y_bins=(10, 100), max_bow_genre_size=1, t_bins=16,
        min_duration=1.0, max_duration=600.0, use_tokens=True, n_tokens=16,
        n_vocab=79, prime_loss_fraction=0.4,
        n_ctx=64, prior_width=32, prior_depth=10, heads=2, attn_order=8,
        blocks=8, init_scale=0.7, prime_width=16, prime_depth=2,
        prime_heads=1, prime_attn_order=0, prime_blocks=4,
        prime_init_scale=0.7))
    prior = make_prior(hps, vqvae)
    funcs = [prior.model.prior.transformer.attn_func(d) for d in range(10)]
    assert 6 in funcs
    bs = 2
    y = _labels(prior, bs)
    kw = dict(n_samples=bs, z=None, z_conds=None, y=y, rng=jax.random.key(4),
              fp16=False, temp=0.99, chunk_size=8)
    ref = prior.sample(segment_tokens=None, **kw)
    prior.stage_decode()
    staged = prior.sample(segment_tokens=8, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(staged))


@pytest.mark.parametrize("mb", [1, 2])
def test_prefill_microbatch_token_identical(vqvae, mb, monkeypatch):
    """JUKEBOX_PREFILL_MB splits the cache prefill along the sample axis
    (bounding the h_in/chunk transients that capped hop windows at bs=16);
    the scattered sub-batch K/V must reproduce the single-pass prefill
    exactly, so the decoded token stream is identical."""
    prior = _upsampler_prior(vqvae)
    bs = 4
    rs = np.random.RandomState(5)
    z = jnp.asarray(rs.randint(0, 32, (bs, 32)))
    z_conds = [jnp.asarray(rs.randint(0, 32, (bs, 32)))]
    kw = dict(n_samples=bs, z=z, z_conds=z_conds, y=None,
              rng=jax.random.key(11), fp16=False, temp=0.99, chunk_size=8)
    ref = prior.sample(segment_tokens=8, **kw)
    monkeypatch.setenv("JUKEBOX_PREFILL_MB", str(mb))
    out = prior.sample(segment_tokens=8, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(out[:, :32]), np.asarray(z))


def test_prefill_microbatch_single_enc_dec(vqvae, monkeypatch):
    """Microbatched prefill through the merged lyric+music path (order-12
    specials + per-pattern ring caches + prime caches)."""
    prior = _single_enc_dec_prior(vqvae)
    bs = 4
    y = _labels(prior, bs)
    z = jnp.asarray(np.random.RandomState(6).randint(0, 32, (bs, 32)))
    kw = dict(n_samples=bs, z=z, z_conds=None, y=y, rng=jax.random.key(12),
              fp16=False, temp=0.99, chunk_size=8)
    ref = prior.sample(segment_tokens=8, **kw)
    monkeypatch.setenv("JUKEBOX_PREFILL_MB", "2")
    out = prior.sample(segment_tokens=8, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def _sep_enc_dec_prior(vqvae):
    """Separate lyric-encoder prior (the 5b_lyrics architecture shape)."""
    hps = setup_hparams("teeny", dict(
        sample_length=256, sr=8000, level=1, levels=2, labels=True,
        labels_v3=True, y_bins=(10, 100), max_bow_genre_size=1, t_bins=16,
        min_duration=1.0, max_duration=600.0, use_tokens=True, n_tokens=16,
        n_vocab=79, prime_loss_fraction=0.4,
        n_ctx=64, prior_width=32, prior_depth=10, heads=2, attn_order=8,
        blocks=8, init_scale=0.7, prime_width=16, prime_depth=2,
        prime_heads=1, prime_attn_order=0, prime_blocks=4,
        prime_init_scale=0.7))
    return make_prior(hps, vqvae)


def test_cond_bs1_collapse_token_identical(vqvae):
    """When every sample shares identical labels (the standard windowed
    -sampling batch), the segmented path collapses x_cond to batch 1 and
    broadcasts it per step (the full [N, n_ctx, width] buffer + its XLA
    layout copy was the 5b bs=16 decode-segment OOM). Tokens must be
    identical to the monolithic full-batch path, and the collapse must
    actually fire."""
    prior = _sep_enc_dec_prior(vqvae)
    bs = 3
    y = _labels(prior, bs)
    kw = dict(n_samples=bs, z=None, z_conds=None, y=y, rng=jax.random.key(21),
              fp16=False, temp=0.99, chunk_size=8)
    ref = prior.sample(segment_tokens=None, **kw)  # monolithic, full batch
    state = prior._sample_init(prior.params, bs, z=None, z_conds=None, y=y,
                               fp16=False, chunk_size=8)
    x_cond = state[2]
    assert x_cond.shape[0] == 1, "identical labels must collapse x_cond"
    seg = prior.sample(segment_tokens=8, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(seg))


def test_cond_bs1_mixed_labels_stays_full(vqvae):
    """Distinct per-sample labels must NOT collapse (each sample's timing /
    artist conditioning differs) and still match the monolithic stream."""
    prior = _sep_enc_dec_prior(vqvae)
    metas = [dict(artist="unknown", genre="unknown", lyrics="twinkle",
                  total_length=8000 * 60, offset=0),
             dict(artist="unknown", genre="unknown", lyrics="little star",
                  total_length=8000 * 90, offset=8000)]
    y = prior.get_y(prior.labeller.get_batch_labels(metas), 0)
    kw = dict(n_samples=2, z=None, z_conds=None, y=y, rng=jax.random.key(22),
              fp16=False, temp=0.99, chunk_size=8)
    state = prior._sample_init(prior.params, 2, z=None, z_conds=None, y=y,
                               fp16=False, chunk_size=8)
    assert state[2].shape[0] == 2, "mixed labels must keep per-sample x_cond"
    ref = prior.sample(segment_tokens=None, **kw)
    seg = prior.sample(segment_tokens=8, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(seg))


def test_prime_swap_token_identical(vqvae, monkeypatch):
    """Prime-swap staging (JUKEBOX_SWAP_PRIME): the lyric encoder's weights
    stay host-side, its forward runs in its own jit per window init, and the
    decode rings are built from the precomputed encoder_kv — tokens must be
    identical to the monolithic full-params path, and the prime subtrees
    must actually be absent from the staged light tree (that absence is the
    5b bs=16 HBM-peak reduction)."""
    prior = _sep_enc_dec_prior(vqvae)
    bs = 2
    y = _labels(prior, bs)
    kw = dict(n_samples=bs, z=None, z_conds=None, y=y, rng=jax.random.key(31),
              fp16=False, temp=0.99, chunk_size=8)
    ref = prior.sample(segment_tokens=None, **kw)  # monolithic, full params
    monkeypatch.setenv("JUKEBOX_SWAP_PRIME", "1")
    prior.stage_decode()
    assert prior._staged_prime_host is not None
    assert "prime_prior" not in prior._staged_light, \
        "prime encoder must be off the staged light tree"
    out = prior.sample(segment_tokens=8, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    prior.to_host()
    assert prior._staged_prime_host is None
