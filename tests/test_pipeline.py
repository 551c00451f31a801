"""End-to-end integration: tiny VQ-VAE + upsampler + top prior built through
the hparams/make_models factories, run through the full windowed ancestral
sampling cascade (the BASELINE.json config-1/2/3 slice at toy scale)."""

import os

import numpy as np
import pytest

from jukebox_tpu.hparams import Hyperparams, setup_hparams
from jukebox_tpu.models.make_models import make_prior, make_vqvae
from jukebox_tpu.sample import _sample, primed_sample


@pytest.fixture(scope="module")
def tiny_models():
    vq_hps = setup_hparams("teeny", dict(
        sample_length=512, sr=8000, levels=2, downs_t=(2, 1), strides_t=(2, 2),
        emb_width=16, l_bins=64, l_mu=0.99, commit=0.02, width=8, depth=2,
        m_conv=1.0, dilation_growth_rate=1))
    vqvae = make_vqvae(vq_hps)
    # initialise the codebooks with one training forward
    import jax
    loss_hps = Hyperparams(**{**dict(vq_hps),
                              "bandwidth": {"l1": 1.0, "l2": 1.0, "spec": 1.0}})
    x = jax.random.uniform(jax.random.key(0), (2, 512, 1), minval=-1, maxval=1)
    vqvae.forward(x, loss_hps, loss_fn="l2", train=True, rng=jax.random.key(1))

    top_hps = setup_hparams("teeny", dict(
        sample_length=512, sr=8000, level=1, levels=2, labels=False,
        n_ctx=32, prior_width=32, prior_depth=3, heads=2, attn_order=2,
        blocks=8, init_scale=0.7, min_duration=1.0, max_duration=600.0))
    top = make_prior(top_hps, vqvae)

    ups_hps = setup_hparams("teeny", dict(
        sample_length=512, sr=8000, level=0, levels=2, labels=False,
        n_ctx=64, prior_width=32, prior_depth=3, heads=2, attn_order=2,
        blocks=8, init_scale=0.7, cond_width=16, cond_depth=2,
        cond_dilation_growth_rate=1, min_duration=1.0, max_duration=600.0))
    ups = make_prior(ups_hps, vqvae)
    return vqvae, [ups, top]


def test_prior_shapes(tiny_models):
    vqvae, priors = tiny_models
    ups, top = priors
    assert top.n_ctx == 32 and top.raw_to_tokens == 8
    assert ups.n_ctx == 64 and ups.raw_to_tokens == 4
    assert ups.cond_downsample == 2


def test_prior_training_forward(tiny_models):
    vqvae, priors = tiny_models
    import jax
    for prior in priors:
        x = jax.random.uniform(jax.random.key(3), (2, prior.sample_length, 1),
                               minval=-1, maxval=1)
        _, loss, metrics = prior.forward(x, y=None)
        assert np.isfinite(float(loss))
        assert "bpd" in metrics


def test_ancestral_cascade(tiny_models, tmp_path):
    vqvae, priors = tiny_models
    hps = Hyperparams(n_samples=2, sample_length=512, sr=8000,
                      hop_fraction=(0.5, 0.5), levels=2, n_tokens=0,
                      name=str(tmp_path / "samples"), seed=0)
    sampling_kwargs = [dict(temp=0.99, fp16=False, chunk_size=8, max_batch_size=2),
                       dict(temp=0.99, fp16=False, chunk_size=8, max_batch_size=2)]
    labels = [p.labeller.get_batch_labels([{}, {}]) for p in priors]

    zs = [np.zeros((2, 0), dtype=np.int64) for _ in priors]
    zs = _sample(zs, labels, sampling_kwargs, priors, [0, 1], hps)

    assert zs[1].shape == (2, 64)   # top level: 512 / 8
    assert zs[0].shape == (2, 128)  # bottom level: 512 / 4
    assert (zs[0] >= 0).all() and (zs[0] < 64).all()
    # outputs on disk: wav + data + html per level
    for level in (0, 1):
        d = f"{hps.name}/level_{level}"
        assert os.path.exists(f"{d}/item_0.wav")
        assert os.path.exists(f"{d}/data.jkb")
        assert os.path.exists(f"{d}/item_0.html")


def test_primed_cascade(tiny_models, tmp_path):
    vqvae, priors = tiny_models
    hps = Hyperparams(n_samples=2, sample_length=512, sr=8000,
                      hop_fraction=(0.5, 0.5), levels=2, n_tokens=0,
                      name=str(tmp_path / "primed"), seed=0)
    sampling_kwargs = [dict(temp=0.99, fp16=False, chunk_size=8, max_batch_size=2),
                       dict(temp=0.99, fp16=False, chunk_size=8, max_batch_size=2)]
    labels = [p.labeller.get_batch_labels([{}, {}]) for p in priors]
    x = np.random.RandomState(0).uniform(-1, 1, (2, 512, 1)).astype(np.float32)

    zs = primed_sample(x, labels, sampling_kwargs, priors, hps)
    assert zs[1].shape == (2, 64)
    assert zs[0].shape == (2, 128)


def test_pipelined_cascade_token_identical(tiny_models, tmp_path):
    """hps.pipeline_cascade interleaves lower-level windows as soon as their
    z_cond range exists; the greedy schedule must reproduce the sequential
    cascade's tokens exactly (same per-level window order + rng folds)."""
    vqvae, priors = tiny_models
    common = dict(n_samples=2, sample_length=1024, sr=8000,
                  hop_fraction=(0.5, 0.5), levels=2, n_tokens=0, seed=0)
    sampling_kwargs = [dict(temp=0.99, fp16=False, chunk_size=8, max_batch_size=2),
                       dict(temp=0.99, fp16=False, chunk_size=8, max_batch_size=2)]
    labels = [p.labeller.get_batch_labels([{}, {}]) for p in priors]

    hps_seq = Hyperparams(name=str(tmp_path / "seq"), **common)
    zs_seq = _sample([np.zeros((2, 0), dtype=np.int64) for _ in priors],
                     labels, sampling_kwargs, priors, [0, 1], hps_seq)

    hps_pipe = Hyperparams(name=str(tmp_path / "pipe"), pipeline_cascade=True,
                           **common)
    zs_pipe = _sample([np.zeros((2, 0), dtype=np.int64) for _ in priors],
                      labels, sampling_kwargs, priors, [0, 1], hps_pipe)

    # multi-window at both levels so the schedule really interleaves
    assert zs_seq[1].shape[1] > priors[1].n_ctx
    for a, b in zip(zs_seq, zs_pipe):
        np.testing.assert_array_equal(a, b)
    for level in (0, 1):
        assert os.path.exists(f"{hps_pipe.name}/level_{level}/item_0.wav")


def test_pipelined_cascade_deferred_alignment(tiny_models, tmp_path,
                                              monkeypatch):
    """JUKEBOX_ALIGN_DEFER=1 (auto-on at 5B scale, where the alignment's
    raw-param staging cannot overlap lower levels' HBM residency) holds the
    alignment worker until every level finishes sampling; the cascade must
    neither deadlock nor change tokens/artifacts."""
    vqvae, priors = tiny_models
    monkeypatch.setenv("JUKEBOX_ALIGN_DEFER", "1")
    common = dict(n_samples=2, sample_length=1024, sr=8000,
                  hop_fraction=(0.5, 0.5), levels=2, n_tokens=0, seed=0)
    sampling_kwargs = [dict(temp=0.99, fp16=False, chunk_size=8,
                            max_batch_size=2)] * 2
    labels = [p.labeller.get_batch_labels([{}, {}]) for p in priors]
    hps = Hyperparams(name=str(tmp_path / "defer"), pipeline_cascade=True,
                      **common)
    zs = _sample([np.zeros((2, 0), dtype=np.int64) for _ in priors],
                 labels, sampling_kwargs, priors, [0, 1], hps)
    monkeypatch.delenv("JUKEBOX_ALIGN_DEFER")
    hps_ref = Hyperparams(name=str(tmp_path / "nodefer"),
                          pipeline_cascade=True, **common)
    zs_ref = _sample([np.zeros((2, 0), dtype=np.int64) for _ in priors],
                     labels, sampling_kwargs, priors, [0, 1], hps_ref)
    for a, b in zip(zs, zs_ref):
        np.testing.assert_array_equal(a, b)
    for level in (0, 1):
        assert os.path.exists(f"{hps.name}/level_{level}/item_0.wav")


def test_jit_sharing_token_identity(monkeypatch):
    """The two upsampler levels of a cascade share one set of compiled
    sampling callables (same SimplePrior.jit_key; make_models._shared_jits):
    tokens from the shared graphs must equal a JUKEBOX_SHARE_JIT=0 build
    where every PriorRuntime jits its own."""
    import jax

    def build():
        vq_hps = setup_hparams("teeny", dict(
            sample_length=512, sr=8000, levels=3, downs_t=(1, 1, 1),
            strides_t=(2, 2, 2), emb_width=16, l_bins=64, l_mu=0.99,
            commit=0.02, width=8, depth=2, m_conv=1.0,
            dilation_growth_rate=1))
        vqvae = make_vqvae(vq_hps)
        ups = []
        for level in (0, 1):
            hps = setup_hparams("teeny", dict(
                sample_length=512, sr=8000, level=level, levels=3,
                labels=False, n_ctx=32, prior_width=32, prior_depth=3,
                heads=2, attn_order=2, blocks=8, init_scale=0.7,
                cond_width=16, cond_depth=2, cond_dilation_growth_rate=1,
                min_duration=1.0, max_duration=600.0))
            ups.append(make_prior(hps, vqvae))
        return ups

    def window_tokens(prior):
        z_cond = np.asarray(
            jax.random.randint(jax.random.key(7), (2, 16), 0, 64))
        z = prior.sample(n_samples=2, z=None, z_conds=[z_cond], y=None,
                         rng=jax.random.key(11), temp=1.0)
        return np.asarray(z)

    monkeypatch.setenv("JUKEBOX_SHARE_JIT", "1")
    u0, u1 = build()
    assert u0.model.jit_key == u1.model.jit_key
    assert u0._sample_segment is u1._sample_segment
    shared0, shared1 = window_tokens(u0), window_tokens(u1)

    monkeypatch.setenv("JUKEBOX_SHARE_JIT", "0")
    v0, v1 = build()
    assert v0._sample_segment is not v1._sample_segment
    np.testing.assert_array_equal(shared0, window_tokens(v0))
    np.testing.assert_array_equal(shared1, window_tokens(v1))


def test_alignment_failure_degrades_not_fatal(monkeypatch):
    """A failed alignment stage (e.g. the remote-compile helper 500-ing on
    the 79-layer recording graph — measured, r5 5b cascade) must degrade to
    alignments=None with align_error recorded in stage_walls, never destroy
    the finished sampling cascade."""
    import types

    from jukebox_tpu import align as align_mod
    from jukebox_tpu import sample as sample_mod

    def boom(*a, **k):
        raise RuntimeError("INTERNAL: remote_compile: HTTP 500")

    monkeypatch.setattr(align_mod, "get_alignment", boom)
    fake_top = types.SimpleNamespace(
        n_tokens=4, labeller=object(), alignment_layer=1, alignment_head=0)
    sample_mod.stage_walls.clear()
    out = sample_mod._compute_alignments(
        zs=[], labels=[None], sampling_kwargs=[dict(fp16=False)],
        priors=[fake_top], hps=Hyperparams(name="x"))
    assert out is None
    assert "align_error" in sample_mod.stage_walls
