"""Weight-only int8 decode staging: quantised dense layers must closely
track the full-precision path (per-out-channel absmax scales), the tree
walker must leave non-dense params untouched, and the grouped decode scan
must run end-to-end on quantised segment params."""

import jax
import jax.numpy as jnp
import numpy as np

from jukebox_tpu.models.autoregressive import ConditionalAutoregressive2D
from jukebox_tpu.ops.core import (dense, dense_init, quantize_dense,
                                  quantize_dense_tree)


def test_quantize_dense_error_bound():
    rng = jax.random.key(0)
    p = dense_init(rng, 256, 128)
    p = {"w": p["w"] + 0.3, "b": jnp.asarray(np.random.RandomState(0)
                                             .randn(128), jnp.float32)}
    x = jax.random.normal(jax.random.key(1), (4, 7, 256))
    y = dense(p, x)
    q = quantize_dense(jax.tree_util.tree_map(np.asarray, p))
    yq = dense({k: jnp.asarray(v) for k, v in q.items()}, x)
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.02, rel
    assert q["w_q"].dtype == np.int8
    assert q["s"].shape == (1, 128)


def test_quantize_zero_out_weight():
    # zero-init c_proj layers must survive (scale floor, exact zeros)
    p = {"w": np.zeros((16, 8), np.float32), "b": np.zeros((8,), np.float32)}
    q = quantize_dense(p)
    np.testing.assert_array_equal(q["w_q"], 0)
    x = jnp.ones((2, 3, 16))
    np.testing.assert_array_equal(np.asarray(dense(
        {k: jnp.asarray(v) for k, v in q.items()}, x)), 0.0)


def test_quantize_tree_selectivity():
    tree = {
        "attn": {"c_attn": {"w": np.ones((4, 12), np.float32),
                            "b": np.zeros((12,), np.float32)}},
        "ln_0": {"g": np.ones((4,), np.float32),
                 "b": np.zeros((4,), np.float32)},
        "emb": {"weight": np.ones((10, 4), np.float32)},
    }
    q = quantize_dense_tree(tree)
    assert "w_q" in q["attn"]["c_attn"]
    assert set(q["ln_0"].keys()) == {"g", "b"}          # LN untouched
    assert set(q["emb"].keys()) == {"weight"}            # embeddings untouched


def test_int8_decode_matches_full():
    """Grouped decode over quantised segment params tracks the full-precision
    decode closely (small model; per-channel int8 weight error only)."""
    prior = ConditionalAutoregressive2D(
        input_shape=(32,), bins=16, width=64, depth=6, heads=2,
        attn_order=2, blocks=8, x_cond=True, y_cond=True)
    tr = prior.transformer
    assert any(s[0] == "scan" for s in tr.decode_plan)
    params = prior.init(jax.random.key(0))

    dec = tr.prepare_decode_params(params["transformer"])
    dec_host = jax.tree_util.tree_map(np.asarray, dec)
    dec_q = jax.tree_util.tree_map(jnp.asarray, quantize_dense_tree(dec_host))

    caches = tr.init_cache(params["transformer"], 2, jnp.float32)
    caches_q = jax.tree_util.tree_map(jnp.array, caches)
    h_errs = []
    x = jax.random.normal(jax.random.key(1), (2, 1, 64))
    for t in range(6):
        h, caches = tr.decode_step(dec, caches, x, jnp.int32(t))
        h_q, caches_q = tr.decode_step(dec_q, caches_q, x, jnp.int32(t))
        h_errs.append(float(jnp.linalg.norm(h_q - h) / jnp.linalg.norm(h)))
        x = jax.random.normal(jax.random.key(2 + t), (2, 1, 64))
    assert max(h_errs) < 0.05, h_errs
