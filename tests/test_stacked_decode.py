"""The stacked-cycle decode path (lax.scan over stacked layer groups) must
match the full teacher-forced forward exactly, like the flat path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jukebox_tpu.models.autoregressive import ConditionalAutoregressive2D


@pytest.mark.parametrize("depth", [6, 9])
def test_stacked_decode_matches_forward(depth):
    prior = ConditionalAutoregressive2D(
        input_shape=(32,), bins=16, width=32, depth=depth, heads=2,
        attn_order=2, blocks=8, x_cond=True, y_cond=True)
    assert prior.transformer.stacked_cycle == 3
    params = prior.init(jax.random.key(0))
    xc = jax.random.normal(jax.random.key(1), (4, 32, 32))
    yc = jax.random.normal(jax.random.key(2), (4, 1, 32))

    x, preds_sample = prior.sample(params, 4, jax.random.key(3), x_cond=xc,
                                   y_cond=yc, get_preds=True)
    _, preds_forw = prior.forward(params, x, x_cond=xc, y_cond=yc,
                                  get_preds=True)
    np.testing.assert_allclose(np.asarray(preds_sample), np.asarray(preds_forw),
                               atol=2e-4)

    # primed + chunked through the stacked prefill
    prime = 24
    x2, preds_sample2 = prior.primed_sample(params, 4, x[:, :prime],
                                            jax.random.key(4), x_cond=xc,
                                            y_cond=yc, get_preds=True,
                                            chunk_size=8)
    np.testing.assert_array_equal(np.asarray(x2[:, :prime]),
                                  np.asarray(x[:, :prime]))
    _, preds_forw2 = prior.forward(params, x2, x_cond=xc, y_cond=yc,
                                   get_preds=True)
    np.testing.assert_allclose(np.asarray(preds_sample2),
                               np.asarray(preds_forw2), atol=2e-4)
