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


def test_fsdp_equivalence_and_memory_scaling():
    """ZeRO-3-style fully-sharded params over 'dp' (hps.fsdp): the train
    step must produce identical numbers to the replicated run, while params
    + Adam moments occupy ~1/dp of their bytes per device."""
    from jukebox_tpu.parallel.shardings import (fsdp_param_specs,
                                                shard_params)
    prior, step, x, y = _build()
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    p1, o1 = copy(prior.params), adam_init(prior.params)
    new1, loss1, gn1 = _run(step, p1, o1, x, y)

    mesh = make_mesh(mesh_dp=4, mesh_mp=1, devices=jax.devices()[:4])
    specs = fsdp_param_specs(prior.params, 4, min_size=64)
    p2 = shard_params(mesh, copy(prior.params), specs)
    o2 = adam_init(prior.params)
    o2 = {"m": shard_params(mesh, o2["m"], specs),
          "v": shard_params(mesh, o2["v"], specs),
          "step": replicate(mesh, o2["step"])}
    x2, y2 = shard_batch(mesh, x), shard_batch(mesh, y)
    new2, loss2, gn2 = _run(step, p2, o2, x2, y2)

    np.testing.assert_allclose(loss2, loss1, rtol=2e-6)
    np.testing.assert_allclose(gn2, gn1, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new1),
                    jax.tree_util.tree_leaves(new2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)

    # the big leaves really are sharded: per-device bytes of the sharded
    # leaves = leaf/4
    big = [(l, s) for l, s in zip(jax.tree_util.tree_leaves(p2),
                                  jax.tree_util.tree_leaves(
                                      specs, is_leaf=lambda q: hasattr(q, "index")))
           if l.size >= 64]
    assert big
    n_sharded = 0
    for leaf, _ in big:
        shard = leaf.sharding.shard_shape(leaf.shape)
        if int(np.prod(shard)) == leaf.size // 4:
            n_sharded += 1
    assert n_sharded >= len(big) // 2, (n_sharded, len(big))


def test_fsdp_5b_shape_memory_fits_16gb_mesh():
    """VERDICT stretch goal: a 5b-shape prior's params + fp32 Adam moments
    under fsdp_param_specs must fit an 8 x 16 GB mesh. Uses jax.eval_shape
    (no materialisation) on the real prior_5b_lyrics dimensions."""
    from jukebox_tpu.models.autoregressive import ConditionalAutoregressive2D
    from jukebox_tpu.parallel.shardings import (fsdp_param_specs,
                                                per_device_fraction)

    # prior_5b_lyrics core: width 4800, depth 72 (+ lyric encoder elided —
    # the music transformer dominates), hparams.py prior_5b_lyrics
    prior = ConditionalAutoregressive2D(
        input_shape=(8192,), bins=2048, width=4800, depth=72, heads=8,
        attn_order=2, blocks=128, x_cond=False, y_cond=True)
    shapes = jax.eval_shape(prior.init, jax.random.key(0))

    dp = 8
    specs = fsdp_param_specs(shapes, dp)
    pf = per_device_fraction(shapes, specs, dp)
    assert pf < 1.05 / dp, pf  # within 5% of perfect 1/dp scaling

    total_params = sum(int(np.prod(l.shape))
                      for l in jax.tree_util.tree_leaves(shapes))
    assert total_params > 4e9  # really 5b scale
    # params fp32 + m fp32 + v fp32 (worst case; bf16 params and fp16_opt
    # only shrink this), at the per-device sharded fraction
    per_device = 3 * 4 * total_params * pf
    assert per_device < 10e9, per_device  # leaves ~6 GB for activations
