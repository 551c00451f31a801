"""SimplePrior lyric-conditioning modes: single enc-dec (merged vocab) and
separate enc-dec (lyric encoder -> cross-attention), plus LabelConditioner /
RangeEmbedding semantics (reference prior/prior.py:81-124,
conditioners.py:70-157)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jukebox_tpu.hparams import setup_hparams
from jukebox_tpu.models.conditioners import LabelConditioner, RangeEmbedding
from jukebox_tpu.models.make_models import make_prior, make_vqvae

SR = 8000
N_CTX = 32
N_TOKENS = 8


@pytest.fixture(scope="module")
def vqvae():
    hps = setup_hparams("teeny", dict(
        sample_length=512, sr=SR, levels=2, downs_t=(2, 1), strides_t=(2, 2),
        emb_width=16, l_bins=32, l_mu=0.99, commit=0.02, width=8, depth=2,
        m_conv=1.0, dilation_growth_rate=1))
    return make_vqvae(hps)


def _labels(prior, bs=2):
    metas = [dict(artist="unknown", genre="unknown",
                  lyrics="la la la hello world " * 5,
                  total_length=600 * SR, offset=0)] * bs
    return prior.labeller.get_batch_labels(metas)


def _base(single):
    d = dict(
        sample_length=512, sr=SR, level=1, levels=2, labels=True,
        labels_v3=True, y_bins=(10, 100), max_bow_genre_size=1, t_bins=16,
        min_duration=1.0, max_duration=600.0, use_tokens=True,
        n_tokens=N_TOKENS, n_vocab=79, prime_loss_fraction=0.4,
        n_ctx=N_CTX, prior_width=32, prior_depth=3, heads=2, attn_order=2,
        blocks=8, init_scale=0.7)
    if single:
        d.update(single_enc_dec=True, attn_order=12)
    else:
        d.update(prime_width=16, prime_depth=2, prime_heads=2,
                 prime_attn_order=2, prime_blocks=4, prime_init_scale=0.7)
    return d


@pytest.mark.parametrize("single", [True, False])
def test_lyric_prior_train_and_sample(vqvae, single):
    hps = setup_hparams("teeny", _base(single))
    prior = make_prior(hps, vqvae)
    labels = _labels(prior)
    y = prior.get_y(labels, 0)
    assert y.shape == (2, 4 + 1 + N_TOKENS)

    # training forward: separate prime/gen losses combine per fractions
    z = jax.random.randint(jax.random.key(0), (2, N_CTX), 0, 32)
    loss, metrics = prior.z_forward(z, [], y)
    assert np.isfinite(float(loss))
    assert float(metrics["prime_loss"]) > 0
    expected = (0.4 * metrics["prime_loss"] * prior.prime_loss_dims
                / prior.total_loss_dims
                + metrics["gen_loss"] * prior.gen_loss_dims
                / prior.total_loss_dims)
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-5)

    # ancestral sampling conditioned on the lyrics
    z_out = prior.sample(2, y=y, rng=jax.random.key(1), temp=0.99)
    assert z_out.shape == (2, N_CTX)
    assert (np.asarray(z_out) >= 0).all() and (np.asarray(z_out) < 32).all()

    # primed continuation keeps the prime
    z_prime = np.asarray(z_out)[:, : N_CTX // 2]
    z_cont = prior.sample(2, z=jnp.asarray(z_prime), y=y,
                          rng=jax.random.key(2), temp=0.99, chunk_size=8)
    np.testing.assert_array_equal(np.asarray(z_cont)[:, : N_CTX // 2], z_prime)


def test_single_enc_dec_vocab_shift(vqvae):
    """prior_preprocess shifts lyric/VQ ids into a merged vocab and
    postprocess inverts it (prior.py:168-203)."""
    hps = setup_hparams("teeny", _base(True))
    prior = make_prior(hps, vqvae).model
    params = make_prior(hps, vqvae).params
    prime = jnp.ones((2, N_TOKENS), jnp.int32) * 3
    z = jnp.ones((2, N_CTX), jnp.int32) * 7
    merged, _ = prior.prior_preprocess(
        [prime, z], [None, jnp.zeros((2, N_CTX, 32))])
    assert merged.shape == (2, N_TOKENS + N_CTX)
    assert (np.asarray(merged)[:, :N_TOKENS] == 3).all()          # lyric ids first
    assert (np.asarray(merged)[:, N_TOKENS:] == 7 + 79).all()     # vq shifted by n_vocab
    back = prior.prior_postprocess(merged)
    assert (np.asarray(back) == 7).all()


def test_label_conditioner_genre_masking():
    lc = LabelConditioner(y_bins=(10, 100), t_bins=16, sr=SR, min_duration=1.0,
                          max_duration=600.0, n_time=N_CTX, out_width=8,
                          init_scale=1.0, max_bow_genre_size=3,
                          include_time_signal=True)
    params = lc.init(jax.random.key(0))
    y = np.array([[600 * SR, 0, 512, 5, 2, -1, -1]], dtype=np.int64)
    start, pos = lc.apply(params, jnp.asarray(y))
    assert start.shape == (1, 1, 8)
    assert pos.shape == (1, N_CTX, 8)
    # -1 genre slots must contribute nothing: only genre 2 + artist 5
    expect = (params["bow_genre_emb"]["emb"]["weight"][2]
              + params["artist_emb"]["emb"]["weight"][5])
    np.testing.assert_allclose(np.asarray(start[0, 0]), np.asarray(expect),
                               atol=1e-6)


def test_range_embedding_binning():
    """[start,end) interpolated over n_time then floor-binned
    (conditioners.py:70-111)."""
    emb = RangeEmbedding(n_time=4, bins=8, pos_range=(0.0, 16.0), out_width=4,
                         init_scale=1.0)
    params = emb.init(jax.random.key(0))
    out = emb.apply(params, jnp.asarray([[0.0]]), jnp.asarray([[16.0]]))
    # positions 0,4,8,12 -> normalised 0,.25,.5,.75 -> bins 0,2,4,6
    w = np.asarray(params["emb"]["weight"])
    np.testing.assert_allclose(np.asarray(out[0]), w[[0, 2, 4, 6]], atol=1e-6)


@pytest.mark.parametrize("single", [True])
def test_attention_recording_for_alignment(vqvae, single):
    """get_attn_weights returns (jitted) lyric-attention maps with shape
    [bs, n_ctx_music, n_tokens] after func-7 slicing (align.py:49-55)."""
    hps = setup_hparams("teeny", _base(single))
    hps["prior_depth"] = 16  # ensure a func-7 layer exists (d%16==15)
    prior = make_prior(hps, vqvae)
    labels = _labels(prior)
    y = prior.get_y(labels, 0)
    z = jax.random.randint(jax.random.key(0), (2, N_CTX), 0, 32)
    ws = prior.z_forward(jnp.asarray(z), [], y, get_attn_weights={15})
    assert len(ws) == 1
    # [bs, heads, music positions, lyric positions]
    assert ws[0].shape[0] == 2 and ws[0].shape[-1] == N_TOKENS


@pytest.mark.parametrize("single", [True])
def test_alignment_microbatch_identical(vqvae, single, monkeypatch):
    """JUKEBOX_ALIGN_BS=1 (per-sample recording forwards — bounds the
    alignment's activation HBM at 5B scale, align.py) must stitch the same
    alignments as the whole-batch hop forward."""
    from jukebox_tpu.align import get_alignment
    from jukebox_tpu.hparams import Hyperparams

    hps = setup_hparams("teeny", _base(single))
    hps["prior_depth"] = 16  # ensure a func-7 layer exists (d%16==15)
    prior = make_prior(hps, vqvae)
    prior.alignment_layer, prior.alignment_head = 15, 1
    labels = _labels(prior)
    z = np.asarray(jax.random.randint(jax.random.key(2), (2, N_CTX * 2), 0, 32))
    zs = [None, z]  # top level codes only (levels=2)
    shps = Hyperparams(levels=2, hop_fraction=(0.5, 0.5))

    monkeypatch.delenv("JUKEBOX_ALIGN_BS", raising=False)
    full = get_alignment(None, zs, labels, prior, False, shps)
    monkeypatch.setenv("JUKEBOX_ALIGN_BS", "1")
    micro = get_alignment(None, zs, labels, prior, False, shps)

    assert len(full) == len(micro) == 2
    for a, b in zip(full, micro):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-6)
