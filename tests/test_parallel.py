"""Parallelism equivalence: the same train step must produce the same
numbers regardless of mesh shape — dp-only vs dp x mp (Megatron-style tensor
parallelism over 'mp'). This keeps parallel/shardings.py honest beyond the
driver dryrun (which only checks that the sharded step compiles and runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from jukebox_tpu.hparams import setup_hparams
from jukebox_tpu.models.make_models import make_prior, make_vqvae
from jukebox_tpu.parallel.dist import make_mesh, replicate, shard_batch
from jukebox_tpu.parallel.shardings import prior_param_specs, shard_params
from jukebox_tpu.train import make_prior_train_step
from jukebox_tpu.utils.train_utils import adam_init, make_lr_schedule


def _build():
    vq_hps = setup_hparams("teeny", dict(
        sample_length=512, sr=8000, levels=2, downs_t=(2, 1), strides_t=(2, 2),
        emb_width=16, l_bins=32, l_mu=0.99, commit=0.02, width=8, depth=1,
        m_conv=1.0, dilation_growth_rate=1))
    vqvae = make_vqvae(vq_hps)
    hps = setup_hparams("teeny", dict(
        sample_length=256, sr=8000, level=1, levels=2, labels=True,
        labels_v3=True, y_bins=(10, 100), max_bow_genre_size=1, t_bins=16,
        min_duration=1.0, max_duration=600.0, use_tokens=True, n_tokens=16,
        n_vocab=79, prime_loss_fraction=0.4, single_enc_dec=True,
        n_ctx=32, prior_width=32, prior_depth=3, heads=2, attn_order=12,
        blocks=8, init_scale=0.7, lr=1e-3, prior=True, train=True))
    prior = make_prior(hps, vqvae)
    step = make_prior_train_step(prior, hps, make_lr_schedule(hps))

    bs = 4
    x = jax.random.uniform(jax.random.key(1), (bs, 256, 1), minval=-1, maxval=1)
    n_labels = 4 + 1 + 16
    y = np.zeros((bs, n_labels), np.int64)
    y[:, 0] = 600 * 8000
    y[:, 2] = 256
    return prior, step, x, jnp.asarray(y)


def _run(step, params, opt, x, y):
    new_params, new_opt, _, loss, metrics = step(
        params, opt, None, (x, y), jax.random.key(0), jnp.asarray(1))
    return new_params, float(loss), float(metrics["gn"])


def test_tensor_parallel_equivalence():
    prior, step, x, y = _build()

    # dp=1 x mp=1 single-device reference
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    p1, o1 = copy(prior.params), adam_init(prior.params)
    new1, loss1, gn1 = _run(step, p1, o1, x, y)

    # dp=2 x mp=2 mesh: batch over dp, Megatron splits over mp
    mesh = make_mesh(mesh_dp=2, mesh_mp=2, devices=jax.devices()[:4])
    specs = prior_param_specs(prior.params)
    p2 = shard_params(mesh, copy(prior.params), specs)
    o2_init = adam_init(prior.params)
    o2 = {"m": shard_params(mesh, o2_init["m"], specs),
          "v": shard_params(mesh, o2_init["v"], specs),
          "step": replicate(mesh, o2_init["step"])}
    x2 = shard_batch(mesh, x)
    y2 = shard_batch(mesh, y)
    new2, loss2, gn2 = _run(step, p2, o2, x2, y2)

    np.testing.assert_allclose(loss1, loss2, rtol=2e-5)
    np.testing.assert_allclose(gn1, gn2, rtol=2e-4)
    flat1 = jax.tree_util.tree_leaves(new1)
    flat2 = jax.tree_util.tree_leaves(new2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tensor_parallel_decode_equivalence():
    """Staged decode under an 'mp' mesh (Megatron splits via
    decode_param_specs) must produce the same tokens as single-device staged
    decode — the serving-side TP path (stage_decode(mesh=...))."""
    prior, _, _, y = _build()
    rng = jax.random.key(7)

    prior.stage_decode()
    z1 = prior.sample(4, y=y, rng=rng, fp16=False, temp=0.0, chunk_size=8,
                      segment_tokens=8)

    mesh = make_mesh(mesh_dp=1, mesh_mp=2, devices=jax.devices()[:2])
    prior.stage_decode(mesh=mesh)
    z2 = prior.sample(4, y=y, rng=rng, fp16=False, temp=0.0, chunk_size=8,
                      segment_tokens=8)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))

    # int8-quantised TP staging: same shape/stream runs end-to-end
    prior.stage_decode(quantize="int8", mesh=mesh)
    z3 = prior.sample(4, y=y, rng=rng, fp16=False, temp=0.0, chunk_size=8,
                      segment_tokens=8)
    assert np.asarray(z3).shape == np.asarray(z1).shape
