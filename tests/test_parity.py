"""Numerical parity against the ACTUAL reference implementation, imported
from /root/reference and run on torch CPU (with .cuda() monkeypatched to a
no-op). Weights are randomly initialised in torch and converted through
jukebox_tpu.utils.torch_convert — this validates both the math and the
checkpoint weight-layout mapping that will load released .pth.tar files."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


# --- make the reference importable on CPU ---------------------------------

def _setup_reference():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    for name, attrs in [("soundfile", {}), ("librosa", {}), ("av", {}),
                        ("unidecode", {"unidecode": lambda s: s})]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # the reference asserts isinstance(x, t.cuda.LongTensor)
    torch.cuda.LongTensor = torch.LongTensor
    # the reference uses the torch-1.4 stft API (real view output)
    _orig_stft = torch.stft

    def _compat_stft(x, n_fft, hop_length=None, win_length=None, window=None, **kw):
        if "return_complex" in kw:  # modern caller: pass through untouched
            return _orig_stft(x, n_fft, hop_length=hop_length,
                              win_length=win_length, window=window, **kw)
        out = _orig_stft(x, n_fft, hop_length=hop_length, win_length=win_length,
                         window=window, return_complex=True, **kw)
        return torch.view_as_real(out)

    torch.stft = _compat_stft
    # dist_adapter treats "torch.distributed importable" as "initialised"
    # (true on torch 1.4 + MPI launch); force the single-process no-op path
    import jukebox.utils.dist_adapter as dist_adapter
    dist_adapter.is_available = lambda: False

    # the reference hardcodes device='cuda' in a few creation calls
    # (prior.py:183,309, conditioners.py:103); map them to cpu
    def _cpu_dev(fn):
        def wrapped(*args, **kw):
            if str(kw.get("device", "")).startswith("cuda"):
                kw["device"] = "cpu"
            return fn(*args, **kw)
        return wrapped

    for name in ("tensor", "zeros", "ones", "arange", "randn", "empty"):
        setattr(torch, name, _cpu_dev(getattr(torch, name)))

    # torch>=2 rejects .view on some non-contiguous slices the reference uses
    _orig_view = torch.Tensor.view

    def _view(self, *shape):
        try:
            return _orig_view(self, *shape)
        except RuntimeError:
            return self.reshape(*shape)

    torch.Tensor.view = _view


_setup_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from jukebox_tpu.utils.torch_convert import (  # noqa: E402
    _autoregressive, _dense, _ln, convert_vqvae_state_dict)


def sd_of(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# --- FactoredAttention ------------------------------------------------------

@pytest.mark.parametrize("attn_func", [0, 1, 2, 3, 4, 6, 7])
def test_factored_attention_parity(attn_func):
    from jukebox.transformer.factored_attention import FactoredAttention as RefAttn

    from jukebox_tpu.models.attention import FactoredAttention

    n_in, n_state, n_head, n_ctx, blocks = 16, 32, 4, 64, 8
    enc_dims = 16 if attn_func == 6 else None
    prime_len = 8

    torch.manual_seed(0)
    ref = RefAttn(n_in, n_ctx, n_state, n_head, mask=True, attn_func=attn_func,
                  blocks=blocks, spread=2, encoder_dims=enc_dims,
                  prime_len=prime_len)
    ref.training = False
    ref.eval()

    ours = FactoredAttention(n_in=n_in, n_ctx=n_ctx, n_state=n_state,
                             n_head=n_head, attn_func=attn_func, blocks=blocks,
                             spread=2, encoder_dims=enc_dims,
                             prime_len=prime_len, mask=True)
    sd = sd_of(ref)
    params = {"c_attn": _dense(sd, "c_attn"), "c_proj": _dense(sd, "c_proj")}
    if attn_func == 6:
        params["c_enc_kv"] = _dense(sd, "c_enc_kv")

    x = np.random.RandomState(1).randn(2, n_ctx, n_in).astype(np.float32)
    enc = (np.random.RandomState(2).randn(2, enc_dims, n_in).astype(np.float32)
           if attn_func == 6 else None)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x),
                      encoder_kv=torch.from_numpy(enc) if enc is not None else None
                      ).numpy()
    our_out, _ = ours.apply(params, jnp.asarray(x),
                            encoder_kv=jnp.asarray(enc) if enc is not None else None)
    np.testing.assert_allclose(np.asarray(our_out), ref_out, atol=2e-5)


# --- Transformer ------------------------------------------------------------

@pytest.mark.parametrize("attn_order", [0, 2, 6])
def test_transformer_parity(attn_order):
    from jukebox.transformer.transformer import Transformer as RefTransformer

    from jukebox_tpu.models.transformer import Transformer
    from jukebox_tpu.utils.torch_convert import _transformer

    n_in, n_ctx, n_head, n_depth, blocks = 16, 64, 4, 6, 8
    enc_dims = 16 if attn_order == 6 else None

    torch.manual_seed(0)
    ref = RefTransformer(n_in, n_ctx, n_head, n_depth, mask=True,
                         attn_order=attn_order, encoder_dims=enc_dims,
                         blocks=blocks)
    ref.eval()

    ours = Transformer(n_in=n_in, n_ctx=n_ctx, n_head=n_head, n_depth=n_depth,
                       mask=True, attn_order=attn_order, encoder_dims=enc_dims,
                       blocks=blocks)
    sd = sd_of(ref)
    # reference names layers transformer._attn_mods.d; here sd keys start at
    # _attn_mods directly
    sd = {f"transformer.{k}" if k.startswith("_attn_mods") else k: v
          for k, v in sd.items()}
    params = _transformer(sd, "transformer", ours)

    x = np.random.RandomState(1).randn(2, n_ctx, n_in).astype(np.float32)
    enc = (np.random.RandomState(2).randn(2, enc_dims, n_in).astype(np.float32)
           if attn_order == 6 else None)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x),
                      encoder_kv=torch.from_numpy(enc) if enc is not None else None
                      ).numpy()
    our_out, _ = ours.apply(params, jnp.asarray(x),
                            encoder_kv=jnp.asarray(enc) if enc is not None else None)
    np.testing.assert_allclose(np.asarray(our_out), ref_out, atol=5e-5)


# --- ConditionalAutoregressive2D --------------------------------------------

@pytest.mark.parametrize("x_cond,y_cond,merged", [
    (False, False, False), (True, True, False), (True, True, True)])
def test_autoregressive_forward_parity(x_cond, y_cond, merged):
    from jukebox.prior.autoregressive import \
        ConditionalAutoregressive2D as RefCA2D

    from jukebox_tpu.models.autoregressive import ConditionalAutoregressive2D

    input_dims, bins, width, depth, heads, blocks = 32, 16, 32, 2, 2, 8
    torch.manual_seed(0)
    ref = RefCA2D((input_dims,), bins, width=width, depth=depth, heads=heads,
                  attn_order=2, blocks=blocks, x_cond=x_cond, y_cond=y_cond,
                  merged_decoder=merged)
    ref.eval()

    ours = ConditionalAutoregressive2D(
        input_shape=(input_dims,), bins=bins, width=width, depth=depth,
        heads=heads, attn_order=2, blocks=blocks, x_cond=x_cond, y_cond=y_cond,
        merged_decoder=merged)
    params = _autoregressive(sd_of(ref), "", ours)

    rs = np.random.RandomState(1)
    x = rs.randint(0, bins, (2, input_dims)).astype(np.int64)
    xc = rs.randn(2, input_dims, width).astype(np.float32) if x_cond else None
    yc = rs.randn(2, 1, width).astype(np.float32) if y_cond else None

    with torch.no_grad():
        ref_loss, ref_preds = ref(
            torch.from_numpy(x),
            x_cond=torch.from_numpy(xc) if xc is not None else None,
            y_cond=torch.from_numpy(yc) if yc is not None else None,
            get_preds=True)
    our_loss, our_preds = ours.forward(
        params, jnp.asarray(x),
        x_cond=jnp.asarray(xc) if xc is not None else None,
        y_cond=jnp.asarray(yc) if yc is not None else None, get_preds=True)
    np.testing.assert_allclose(float(our_loss), float(ref_loss), atol=2e-5)
    np.testing.assert_allclose(np.asarray(our_preds), ref_preds.numpy(), atol=5e-5)


# --- VQ-VAE full forward -----------------------------------------------------

def test_vqvae_forward_parity():
    from jukebox.hparams import Hyperparams as RefH
    from jukebox.vqvae.vqvae import VQVAE as RefVQVAE

    from jukebox_tpu.hparams import Hyperparams
    from jukebox_tpu.models.encdec import BlockCfg
    from jukebox_tpu.models.vqvae import VQVAE

    T, levels = 4096, 2
    torch.manual_seed(0)
    ref = RefVQVAE(input_shape=(T, 1), levels=levels, downs_t=(2, 1),
                   strides_t=(2, 2), emb_width=16, l_bins=32, mu=0.99,
                   commit=0.02, spectral=0.0, multispectral=1.0,
                   multipliers=None, use_bottleneck=True,
                   width=8, depth=2, m_conv=1.0, dilation_growth_rate=1,
                   dilation_cycle=None, reverse_decoder_dilation=True)
    ref.eval()
    # give the codebooks real values (they start at zero)
    rs = np.random.RandomState(3)
    ks = [rs.randn(32, 16).astype(np.float32) for _ in range(levels)]
    for l, k in enumerate(ks):
        ref.bottleneck.level_blocks[l].k.data = torch.from_numpy(k.copy())

    ours = VQVAE(input_shape=(T, 1), levels=levels, downs_t=(2, 1),
                 strides_t=(2, 2), emb_width=16, l_bins=32, mu=0.99,
                 commit=0.02, spectral=0.0, multispectral=1.0,
                 block=BlockCfg(width=8, depth=2, m_conv=1.0,
                                dilation_growth_rate=1,
                                reverse_decoder_dilation=True))
    params, state = convert_vqvae_state_dict(sd_of(ref), ours)

    x = rs.uniform(-1, 1, (2, T, 1)).astype(np.float32)
    hps_common = dict(
        bandwidth={"l1": 1.0, "l2": 1.0, "spec": 1.0},
        use_nonrelative_specloss=True, linf_k=64,
        lmix_l1=0.0, lmix_l2=1.0, lmix_linf=0.02,
        multispec_loss_n_fft=(128,), multispec_loss_hop_length=(32,),
        multispec_loss_window_size=(64,), sr=8000,
        n_fft=128, hop_length=32, window_size=64, aug_blend=False)

    with torch.no_grad():
        ref_out, ref_loss, ref_metrics = ref(torch.from_numpy(x),
                                             RefH(**hps_common), loss_fn="l2")
    our_out, our_loss, our_metrics, _ = ours.forward(
        params, state, jnp.asarray(x), Hyperparams(**hps_common),
        loss_fn="l2", train=False)

    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(), atol=5e-5)
    # spectral losses use a 2048-bin STFT over 256 samples in the reference;
    # compare the recons/commit pieces which dominate
    for key in ("recons_loss", "commit_loss", "l1_loss", "l2_loss",
                "spectral_loss", "multispectral_loss"):
        np.testing.assert_allclose(float(our_metrics[key]),
                                   float(ref_metrics[key]), rtol=2e-3, atol=1e-4,
                                   err_msg=key)

    # codes parity
    with torch.no_grad():
        ref_zs = ref.encode(torch.from_numpy(x))
    our_zs = ours.encode(params, state, jnp.asarray(x))
    for rz, oz in zip(ref_zs, our_zs):
        np.testing.assert_array_equal(rz.numpy(), np.asarray(oz))

    # decode parity from codes
    with torch.no_grad():
        ref_dec = ref.decode([ref_zs[0]], start_level=0, end_level=1).numpy()
    our_dec = ours.decode(params, state, [our_zs[0]], start_level=0, end_level=1)
    np.testing.assert_allclose(np.asarray(our_dec), ref_dec, atol=5e-5)


# --- SimplePrior (full per-level wrapper) ------------------------------------

def _mk_ref_prior(level, levels, n_ctx, l_bins, width, use_tokens=False,
                  single_enc_dec=False, copy_input=False, attn_order=2,
                  labels=False):
    from jukebox.prior.prior import SimplePrior as RefPrior
    torch.manual_seed(0)
    downs, strides = (2, 1), (2, 2)
    # z_shapes scaled so this level gets n_ctx codes
    ds = [s ** d for s, d in zip(strides, downs)]
    import numpy as _np
    hops = _np.cumprod(ds)
    base = [int(64 // h) for h in hops]
    rescale = lambda z: (z * n_ctx // base[level],)
    z_shapes = [rescale(b) for b in base]

    prior_kwargs = dict(input_shape=(n_ctx,), bins=l_bins, width=width,
                        depth=2, heads=2, attn_order=attn_order, blocks=8,
                        spread=None, attn_dropout=0.0, resid_dropout=0.0,
                        emb_dropout=0.0, zero_out=False, res_scale=False,
                        pos_init=False, init_scale=0.7, m_attn=0.25, m_mlp=1.0)
    x_cond_kwargs = dict(out_width=width, init_scale=0.7, width=16, depth=1,
                         m_conv=1.0, dilation_growth_rate=1, dilation_cycle=None,
                         zero_out=False, res_scale=False, checkpoint_res=0)
    y_cond_kwargs = dict(out_width=width, init_scale=0.7, y_bins=(10, 100),
                         t_bins=16, sr=8000, min_duration=1.0,
                         max_duration=600.0, max_bow_genre_size=1)
    if use_tokens and not single_enc_dec:
        prime_kwargs = dict(use_tokens=True, prime_loss_fraction=0.4,
                            n_tokens=8, bins=l_bins if copy_input else 79,
                            width=16, depth=2, heads=2, attn_order=2, blocks=4,
                            spread=None, attn_dropout=0.0, resid_dropout=0.0,
                            emb_dropout=0.0, zero_out=False, res_scale=False,
                            pos_init=False, init_scale=0.7, m_attn=0.25,
                            m_mlp=1.0)
    else:
        prime_kwargs = dict(use_tokens=use_tokens, prime_loss_fraction=0.4,
                            n_tokens=8 if use_tokens else 0,
                            bins=l_bins if copy_input else 79)

    ref = RefPrior(z_shapes=z_shapes, l_bins=l_bins, encoder=None, decoder=None,
                   level=level, downs_t=downs, strides_t=strides, labels=labels,
                   prior_kwargs=dict(prior_kwargs),
                   x_cond_kwargs=dict(x_cond_kwargs),
                   y_cond_kwargs=dict(y_cond_kwargs),
                   prime_kwargs=dict(prime_kwargs), copy_input=copy_input,
                   labels_v3=False, merged_decoder=False,
                   single_enc_dec=single_enc_dec)
    ref.eval()

    from jukebox_tpu.models.prior import SimplePrior
    ours = SimplePrior(z_shapes=z_shapes, l_bins=l_bins, level=level,
                       downs_t=downs, strides_t=strides, labels=labels,
                       prior_kwargs=dict(prior_kwargs),
                       x_cond_kwargs=dict(x_cond_kwargs),
                       y_cond_kwargs=dict(y_cond_kwargs),
                       prime_kwargs=dict(prime_kwargs), copy_input=copy_input,
                       labels_v3=False, merged_decoder=False,
                       single_enc_dec=single_enc_dec)
    return ref, ours


@pytest.mark.parametrize("case", ["upsampler", "sep_enc_dec", "single_enc_dec"])
def test_simple_prior_z_forward_parity(case):
    from jukebox_tpu.utils.torch_convert import convert_prior_state_dict

    l_bins, width, n_ctx = 16, 32, 32
    if case == "upsampler":
        ref, ours = _mk_ref_prior(level=0, levels=2, n_ctx=n_ctx, l_bins=l_bins,
                                  width=width)
    elif case == "sep_enc_dec":
        ref, ours = _mk_ref_prior(level=1, levels=2, n_ctx=n_ctx, l_bins=l_bins,
                                  width=width, use_tokens=True, copy_input=True,
                                  attn_order=6)
    else:
        ref, ours = _mk_ref_prior(level=1, levels=2, n_ctx=n_ctx, l_bins=l_bins,
                                  width=width, use_tokens=True,
                                  single_enc_dec=True, attn_order=12,
                                  labels=True)

    params = convert_prior_state_dict(sd_of(ref), ours)

    rs = np.random.RandomState(1)
    z = rs.randint(0, l_bins, (2, n_ctx)).astype(np.int64)
    y = None
    if case == "single_enc_dec":
        # [total_length, offset, sample_length, artist, genre, *lyric_tokens]
        lyric = rs.randint(0, 79, (2, 8)).astype(np.int64)
        y = np.concatenate([
            np.tile(np.array([[100 * 8000, 0, ours.sample_length, 5, 2]],
                             dtype=np.int64), (2, 1)), lyric], axis=1)
    if case == "upsampler":
        z_cond = rs.randint(0, l_bins, (2, n_ctx // 2)).astype(np.int64)
        ref_zc = [torch.from_numpy(z_cond)]
        our_zc = [jnp.asarray(z_cond)]
    else:
        ref_zc, our_zc = [], []

    with torch.no_grad():
        ref_loss, ref_metrics = ref.z_forward(
            torch.from_numpy(z), ref_zc,
            torch.from_numpy(y) if y is not None else None, get_preds=True)
    our_loss, our_metrics = ours.z_forward(
        params, jnp.asarray(z), our_zc,
        jnp.asarray(y) if y is not None else None, get_preds=True)
    np.testing.assert_allclose(float(our_loss), float(ref_loss), atol=5e-5)
    np.testing.assert_allclose(float(our_metrics["prime_loss"]),
                               float(ref_metrics["prime_loss"]), atol=5e-5)
    np.testing.assert_allclose(np.asarray(our_metrics["preds"]),
                               ref_metrics["preds"].numpy(), atol=1e-4)
