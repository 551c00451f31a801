"""VQ-VAE unit tests: shapes, codebook EMA behaviour, straight-through
gradients, and data-parallel equivalence on a multi-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jukebox_tpu.hparams import Hyperparams
from jukebox_tpu.models.encdec import BlockCfg
from jukebox_tpu.models.vqvae import VQVAE


def small_vqvae(T=512):
    return VQVAE(
        input_shape=(T, 1), levels=2, downs_t=(2, 1), strides_t=(2, 2),
        emb_width=16, l_bins=32, mu=0.99, commit=0.02, spectral=0.0,
        multispectral=1.0,
        block=BlockCfg(width=8, depth=2, m_conv=1.0, dilation_growth_rate=1),
    )


def loss_hps():
    return Hyperparams(
        bandwidth={"l1": 1.0, "l2": 1.0, "spec": 1.0},
        use_nonrelative_specloss=True,
        linf_k=128,
        lmix_l1=0.0, lmix_l2=1.0, lmix_linf=0.02,
        multispec_loss_n_fft=(256,),
        multispec_loss_hop_length=(64,),
        multispec_loss_window_size=(128,),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = small_vqvae()
    params = model.init(jax.random.key(0))
    state = model.init_state()
    return model, params, state


def test_z_shapes(model_and_params):
    model, _, _ = model_and_params
    assert model.z_shapes == [(128,), (64,)]


def test_forward_shapes_and_state_init(model_and_params):
    model, params, state = model_and_params
    x = jax.random.uniform(jax.random.key(1), (2, 512, 1), minval=-1, maxval=1)
    x_out, loss, metrics, new_state = model.forward(
        params, state, x, loss_hps(), loss_fn="l2", train=True, rng=jax.random.key(2))
    assert x_out.shape == x.shape
    assert np.isfinite(float(loss))
    assert bool(new_state["level_blocks"][0]["init"])
    assert bool(new_state["level_blocks"][1]["init"])
    # codebook got non-zero values from data-dependent init
    assert float(jnp.abs(new_state["level_blocks"][0]["k"]).sum()) > 0
    for key in ["recons_loss", "commit_loss", "fit", "pn", "entropy", "usage"]:
        assert key in metrics


def test_encode_decode_shapes(model_and_params):
    model, params, state = model_and_params
    x = jax.random.uniform(jax.random.key(1), (2, 512, 1), minval=-1, maxval=1)
    # initialise codebooks first
    *_, state = model.forward(params, state, x, loss_hps(), train=True,
                              rng=jax.random.key(2))
    zs = model.encode(params, state, x)
    assert [z.shape for z in zs] == [(2, 128), (2, 64)]
    assert all(z.dtype in (jnp.int32, jnp.int64) for z in zs)
    x_rec = model.decode(params, state, zs[0:1], start_level=0, end_level=1)
    assert x_rec.shape == x.shape
    x_rec1 = model.decode(params, state, zs[1:2], start_level=1, end_level=2)
    assert x_rec1.shape == x.shape


def test_straight_through_gradients(model_and_params):
    model, params, state = model_and_params
    x = jax.random.uniform(jax.random.key(1), (2, 512, 1), minval=-1, maxval=1)
    *_, state = model.forward(params, state, x, loss_hps(), train=True,
                              rng=jax.random.key(2))

    def loss_fn(params):
        _, loss, _, _ = model.forward(params, state, x, loss_hps(), loss_fn="l2",
                                      train=False)
        return loss

    grads = jax.grad(loss_fn)(params)
    # encoder gradients must be non-zero despite quantisation (straight-through)
    g = grads["encoders"][0]["level_blocks"][0]["downs"][0]["conv_down"]["w"]
    assert float(jnp.abs(g).sum()) > 0


def test_ema_update_moves_codebook(model_and_params):
    model, params, state = model_and_params
    x = jax.random.uniform(jax.random.key(3), (2, 512, 1), minval=-1, maxval=1)
    *_, s1 = model.forward(params, state, x, loss_hps(), train=True,
                           rng=jax.random.key(4))
    x2 = jax.random.uniform(jax.random.key(5), (2, 512, 1), minval=-1, maxval=1)
    *_, s2 = model.forward(params, s1, x2, loss_hps(), train=True,
                           rng=jax.random.key(6))
    dk = float(jnp.linalg.norm(s2["level_blocks"][0]["k"] - s1["level_blocks"][0]["k"]))
    assert dk > 0


def test_eval_forward_does_not_update_state(model_and_params):
    model, params, state = model_and_params
    x = jax.random.uniform(jax.random.key(3), (2, 512, 1), minval=-1, maxval=1)
    *_, s1 = model.forward(params, state, x, loss_hps(), train=True,
                           rng=jax.random.key(4))
    *_, s2 = model.forward(params, s1, x, loss_hps(), train=False)
    np.testing.assert_array_equal(np.asarray(s1["level_blocks"][0]["k"]),
                                  np.asarray(s2["level_blocks"][0]["k"]))


def test_data_parallel_equivalence():
    """Forward over a dp mesh == single-device forward (the TPU-native
    replacement for bottleneck.py:62-69's all_reduce semantics)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    model = small_vqvae(T=256)
    params = model.init(jax.random.key(0))
    state = model.init_state()
    hps = loss_hps()
    x = jax.random.uniform(jax.random.key(1), (8, 256, 1), minval=-1, maxval=1)
    rng = jax.random.key(2)

    def step(params, state, x):
        _, loss, metrics, new_state = model.forward(params, state, x, hps,
                                                    loss_fn="l2", train=True, rng=rng)
        return loss, new_state

    loss_ref, state_ref = jax.jit(step)(params, state, x)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("dp")))
    loss_dp, state_dp = jax.jit(step)(params, state, x_sharded)

    np.testing.assert_allclose(float(loss_ref), float(loss_dp), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(state_ref["level_blocks"][0]["k"]),
        np.asarray(state_dp["level_blocks"][0]["k"]), atol=2e-5)
