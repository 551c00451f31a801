"""Dropout (attn / resid / emb) semantics: train-only, rng-driven,
reference nn.Dropout behavior (zero w.p. p, scale by 1/(1-p))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jukebox_tpu.models.autoregressive import ConditionalAutoregressive2D
from jukebox_tpu.ops.core import dropout


def test_dropout_op_semantics():
    rng = jax.random.key(0)
    x = jnp.ones((1000, 64))
    y = np.asarray(dropout(x, 0.25, rng))
    kept = y != 0
    # kept values are scaled by 1/(1-p); drop fraction near p
    np.testing.assert_allclose(y[kept], 1.0 / 0.75, rtol=1e-6)
    assert abs(1.0 - kept.mean() - 0.25) < 0.02
    # identity cases
    np.testing.assert_array_equal(np.asarray(dropout(x, 0.0, rng)), x)
    np.testing.assert_array_equal(np.asarray(dropout(x, 0.25, None)), x)


def _prior(**over):
    kw = dict(input_shape=(32,), bins=16, width=32, depth=6, heads=2,
              attn_order=2, blocks=8, x_cond=True, y_cond=True)
    kw.update(over)
    return ConditionalAutoregressive2D(**kw)


def test_forward_dropout_is_stochastic_and_reproducible():
    prior = _prior(attn_dropout=0.1, resid_dropout=0.1, emb_dropout=0.1)
    params = prior.init(jax.random.key(0))
    x = jax.random.randint(jax.random.key(1), (4, 32), 0, 16)
    xc = jax.random.normal(jax.random.key(2), (4, 32, 32))
    yc = jax.random.normal(jax.random.key(3), (4, 1, 32))

    f = jax.jit(lambda r: prior.forward(params, x, x_cond=xc, y_cond=yc,
                                        dropout_rng=r)[0])
    l1, l1b = float(f(jax.random.key(7))), float(f(jax.random.key(7)))
    l2 = float(f(jax.random.key(8)))
    assert l1 == l1b          # reproducible under the same rng
    assert l1 != l2           # stochastic across rngs

    # no rng -> eval behavior, equal to the zero-rate model's forward
    prior0 = _prior()
    l_eval = float(prior.forward(params, x, x_cond=xc, y_cond=yc)[0])
    l_ref = float(prior0.forward(params, x, x_cond=xc, y_cond=yc)[0])
    assert l_eval == l_ref


def test_train_step_with_dropout_decreases_loss(tmp_path):
    from jukebox_tpu.hparams import setup_hparams
    from jukebox_tpu.models.make_models import make_prior, make_vqvae
    from jukebox_tpu.train import make_prior_train_step
    from jukebox_tpu.utils.train_utils import adam_init, make_lr_schedule

    vq_hps = setup_hparams("teeny", dict(
        sample_length=512, sr=8000, levels=2, downs_t=(2, 1), strides_t=(2, 2),
        emb_width=16, l_bins=32, l_mu=0.99, commit=0.02, width=8, depth=2,
        m_conv=1.0, dilation_growth_rate=1))
    vqvae = make_vqvae(vq_hps)
    hps = setup_hparams("teeny", dict(
        sample_length=256, sr=8000, level=1, levels=2, labels=False,
        n_ctx=32, prior_width=32, prior_depth=3, heads=2, attn_order=2,
        blocks=8, init_scale=0.7, min_duration=1.0, max_duration=600.0,
        lr=1e-3, prior=True, train=True,
        attn_dropout=0.05, resid_dropout=0.05, emb_dropout=0.05))
    prior = make_prior(hps, vqvae)
    assert prior.model.prior.attn_dropout == 0.05
    step = make_prior_train_step(prior, hps, make_lr_schedule(hps))
    opt = adam_init(prior.params)
    x = jax.random.uniform(jax.random.key(0), (2, 256, 1), minval=-1, maxval=1)
    losses = []
    params = prior.params
    for i in range(6):
        params, opt, _, loss, _ = step(params, opt, None, (x, None),
                                       jax.random.key(i), jnp.asarray(i + 1))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
