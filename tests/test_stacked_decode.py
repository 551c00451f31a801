"""Segment-stacked decode (lax.scan over stacked layer groups) must match
the full teacher-forced forward exactly, like the flat path — across the
schedules the released models use: order 2 (upsamplers / 5b), order 10
(5b_lyrics, interleaved cross-attn), order 12 (1b_lyrics single_enc_dec,
interleaved prime/dense layers), and order 9 (dense layers inside the scan
pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jukebox_tpu.models.autoregressive import ConditionalAutoregressive2D
from jukebox_tpu.models.transformer import Transformer


def _plan_cost(plan):
    return sum(1 if s[0] == "flat" else len(s[1]) for s in plan)


def _plan_layers(plan):
    out = []
    for s in plan:
        if s[0] == "flat":
            out.append(s[1])
        else:
            _, pat, starts = s
            for g in starts:
                out.extend(range(g, g + len(pat)))
    return out


@pytest.mark.parametrize("attn_order,depth,max_cost", [
    (2, 72, 3),    # one scan: [1,2,3] x 24
    (10, 79, 13),  # [1,2,3]x3 + 10-layer superblock x 7
    (12, 72, 21),  # [1,2,3]-runs between interleaved prime/dense layers
    (11, 48, 15),
    (9, 8, 4),     # [1,2,3,0] x 2 — dense layers inside the scan
    (0, 2, 2),     # too shallow to scan: all flat
])
def test_decode_plan_partition(attn_order, depth, max_cost):
    tr = Transformer(n_in=16, n_ctx=64, n_head=2, n_depth=depth,
                     attn_order=attn_order, blocks=8, encoder_dims=8,
                     prime_len=8)
    plan = tr.decode_plan
    # covers every layer exactly once, in order
    assert _plan_layers(plan) == list(range(depth))
    # funcs recorded in scan segments match the schedule
    for s in plan:
        if s[0] == "scan":
            _, pat, starts = s
            assert len(starts) >= 2
            for g in starts:
                assert tuple(tr.attn_func(g + j) for j in range(len(pat))) \
                    == tuple(pat)
    assert _plan_cost(plan) <= max_cost


@pytest.mark.parametrize("attn_order,depth", [(2, 6), (2, 9), (9, 8)])
def test_stacked_decode_matches_forward(attn_order, depth):
    prior = ConditionalAutoregressive2D(
        input_shape=(32,), bins=16, width=32, depth=depth, heads=2,
        attn_order=attn_order, blocks=8, x_cond=True, y_cond=True)
    assert any(s[0] == "scan" for s in prior.transformer.decode_plan)
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


def test_stacked_decode_order10_cross_attn():
    """Order 10 at depth 20 exercises a func-6 cross-attn layer between scan
    segments (the 5b_lyrics schedule shape)."""
    prior = ConditionalAutoregressive2D(
        input_shape=(32,), bins=16, width=32, depth=20, heads=2,
        attn_order=10, blocks=8, x_cond=True, y_cond=True,
        encoder_dims=8, prime_len=8)
    funcs = [prior.transformer.attn_func(d) for d in range(20)]
    assert 6 in funcs
    assert any(s[0] == "scan" for s in prior.transformer.decode_plan)
    params = prior.init(jax.random.key(0))
    xc = jax.random.normal(jax.random.key(1), (2, 32, 32))
    yc = jax.random.normal(jax.random.key(2), (2, 1, 32))
    enc = jax.random.normal(jax.random.key(5), (2, 8, 32))

    x, preds_sample = prior.sample(params, 2, jax.random.key(3), x_cond=xc,
                                   y_cond=yc, encoder_kv=enc, get_preds=True)
    _, preds_forw = prior.forward(params, x, x_cond=xc, y_cond=yc,
                                  encoder_kv=enc, get_preds=True)
    np.testing.assert_allclose(np.asarray(preds_sample), np.asarray(preds_forw),
                               atol=2e-4)

    x2, preds_sample2 = prior.primed_sample(params, 2, x[:, :16],
                                            jax.random.key(4), x_cond=xc,
                                            y_cond=yc, encoder_kv=enc,
                                            get_preds=True, chunk_size=8)
    _, preds_forw2 = prior.forward(params, x2, x_cond=xc, y_cond=yc,
                                   encoder_kv=enc, get_preds=True)
    np.testing.assert_allclose(np.asarray(preds_sample2),
                               np.asarray(preds_forw2), atol=2e-4)


def test_stacked_decode_order12_prime_layers():
    """Order 12 at depth 18 exercises a func-7 prime layer at d=15 between
    scan segments (the 1b_lyrics schedule shape)."""
    n_ctx, n_tokens = 48, 16
    prior = ConditionalAutoregressive2D(
        input_shape=(n_ctx,), bins=16, width=32, depth=18, heads=2,
        attn_order=12, blocks=8, x_cond=True, y_cond=True,
        prime_len=n_tokens)
    funcs = [prior.transformer.attn_func(d) for d in range(18)]
    assert 7 in funcs
    params = prior.init(jax.random.key(0))
    xc = jax.random.normal(jax.random.key(1), (2, n_ctx, 32))
    yc = jax.random.normal(jax.random.key(2), (2, 1, 32))

    x, preds_sample = prior.sample(params, 2, jax.random.key(3), x_cond=xc,
                                   y_cond=yc, get_preds=True)
    _, preds_forw = prior.forward(params, x, x_cond=xc, y_cond=yc,
                                  get_preds=True)
    np.testing.assert_allclose(np.asarray(preds_sample), np.asarray(preds_forw),
                               atol=2e-4)

    # primed through the prime prefix like single_enc_dec sampling
    x2, preds_sample2 = prior.primed_sample(params, 2, x[:, :n_tokens],
                                            jax.random.key(4), x_cond=xc,
                                            y_cond=yc, get_preds=True,
                                            chunk_size=8)
    _, preds_forw2 = prior.forward(params, x2, x_cond=xc, y_cond=yc,
                                   get_preds=True)
    np.testing.assert_allclose(np.asarray(preds_sample2),
                               np.asarray(preds_forw2), atol=2e-4)


@pytest.mark.parametrize("attn_order,depth,rec", [
    (2, 9, {4}),            # recorded layer inside the [1,2,3] scan
    (2, 9, {0, 8}),         # first and last
    (10, 20, {13}),         # func-6 cross-attn layer of the 5b schedule
    (12, 12, {7}),          # 1b single_enc_dec schedule
])
def test_attention_recording_matches_flat(attn_order, depth, rec):
    """The scan-folded attention-recording forward (transformer.apply with
    record_layers) must equal the naive flat per-layer loop — same final x,
    same recorded softmax (reference record path: transformer.py:146-167).
    The folded path only unrolls the group containing a recorded layer, so
    alignment compiles like the plain forward instead of all n_depth
    layers."""
    tr = Transformer(n_in=16, n_ctx=32, n_head=2, n_depth=depth,
                     attn_order=attn_order, blocks=8, encoder_dims=8,
                     prime_len=8, mask=True)
    assert any(s[0] == "scan" for s in tr.decode_plan)
    params = tr.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 32, 16))
    enc = jax.random.normal(jax.random.key(2), (2, 8, 16))

    x_new, ws_new = tr.apply(params, x, encoder_kv=enc,
                             record_layers=frozenset(rec))

    # naive flat loop (the old record path)
    h = x
    ws_flat = []
    for d in range(depth):
        cfg = tr.block_cfg(d)
        e = enc if cfg.attn_func == 6 else None
        h, w = cfg.apply(params["blocks"][d], h, encoder_kv=e,
                         record=d in rec)
        if d in rec:
            ws_flat.append(w)
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(h), atol=1e-5)
    assert len(ws_new) == len(ws_flat)
    for a, b in zip(ws_new, ws_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
