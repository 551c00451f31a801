"""Checkpoint byte-level fidelity + durability.

1. A REAL torch-serialized `.pth.tar` (zip container, fp16 params, `module.`
   prefixes — the exact on-disk shape of the released jukebox checkpoints,
   reference make_models.py:52-62) round-trips through
   utils/torch_convert.convert_checkpoint into a params pytree whose forward
   matches the torch reference loaded from the same bytes.
2. Native checkpoint saves are atomic (write-to-temp + rename): a crash
   mid-save never corrupts the previous checkpoint; truncated files fail
   loudly on load; stale .tmp leftovers are harmless.
"""

import os
import pickle
import zipfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import test_parity  # noqa: F401,E402  (installs the reference import shims)

import jax.numpy as jnp  # noqa: E402

from jukebox_tpu.utils.checkpoints import (  # noqa: E402
    load_checkpoint, save_checkpoint)


def _small_ref_vqvae():
    from jukebox.vqvae.vqvae import VQVAE as RefVQVAE
    T, levels = 4096, 2
    torch.manual_seed(0)
    ref = RefVQVAE(input_shape=(T, 1), levels=levels, downs_t=(2, 1),
                   strides_t=(2, 2), emb_width=16, l_bins=32, mu=0.99,
                   commit=0.02, spectral=0.0, multispectral=1.0,
                   multipliers=None, use_bottleneck=True,
                   width=8, depth=2, m_conv=1.0, dilation_growth_rate=1,
                   dilation_cycle=None, reverse_decoder_dilation=True)
    ref.eval()
    rs = np.random.RandomState(3)
    for l in range(levels):
        ref.bottleneck.level_blocks[l].k.data = torch.from_numpy(
            rs.randn(32, 16).astype(np.float32))
    return ref, T


def _our_small_vqvae(T):
    from jukebox_tpu.models.encdec import BlockCfg
    from jukebox_tpu.models.vqvae import VQVAE
    return VQVAE(input_shape=(T, 1), levels=2, downs_t=(2, 1),
                 strides_t=(2, 2), emb_width=16, l_bins=32, mu=0.99,
                 commit=0.02, spectral=0.0, multispectral=1.0,
                 block=BlockCfg(width=8, depth=2, m_conv=1.0,
                                dilation_growth_rate=1,
                                reverse_decoder_dilation=True))


def test_pth_tar_bytes_roundtrip(tmp_path):
    """Released-checkpoint container fidelity: torch zip serialization,
    `module.` prefixes, fp16 param dtypes (the 5b checkpoints ship fp16,
    reference make_models.py:174-177) -> convert_checkpoint -> parity
    forward against the reference restored from the SAME file."""
    from jukebox_tpu.utils.torch_convert import convert_checkpoint

    ref, T = _small_ref_vqvae()
    path = str(tmp_path / "checkpoint_test.pth.tar")
    sd = {f"module.{k}": v.detach().clone().half()
          for k, v in ref.state_dict().items()}
    torch.save({"model": sd, "hps": {"sr": 8000}, "step": 1234}, path)

    # the released blobs are torch-zip containers; assert we wrote that format
    assert zipfile.is_zipfile(path)

    ours = _our_small_vqvae(T)
    out = convert_checkpoint(path, "vqvae", ours)
    assert out["step"] == 1234 and out["hps"]["sr"] == 8000
    params, state = out["params"], out["state"]

    # reference side: restore from the same bytes (strip module., as
    # make_models.py:58-60), upcast to fp32 like .float() on load
    ckpt = torch.load(path, map_location="cpu")
    ref_sd = {k[len("module."):]: v.float() for k, v in ckpt["model"].items()}
    ref.load_state_dict(ref_sd)

    x = np.random.RandomState(1).uniform(-1, 1, (2, T, 1)).astype(np.float32)
    with torch.no_grad():
        ref_zs = ref.encode(torch.from_numpy(x))
        ref_dec = ref.decode([ref_zs[0]], start_level=0, end_level=1).numpy()
    our_zs = ours.encode(params, state, jnp.asarray(x))
    for rz, oz in zip(ref_zs, our_zs):
        np.testing.assert_array_equal(rz.numpy(), np.asarray(oz))
    our_dec = ours.decode(params, state, [our_zs[0]], start_level=0, end_level=1)
    np.testing.assert_allclose(np.asarray(our_dec), ref_dec, atol=5e-5)


def test_pth_tar_fp32_no_module_prefix(tmp_path):
    """Plain state_dict without the `module.` DDP prefix (single-GPU-trained
    checkpoints) loads identically."""
    from jukebox_tpu.utils.torch_convert import convert_checkpoint

    ref, T = _small_ref_vqvae()
    path = str(tmp_path / "checkpoint_plain.pth.tar")
    torch.save({"model": ref.state_dict(), "step": 7}, path)
    ours = _our_small_vqvae(T)
    out = convert_checkpoint(path, "vqvae", ours)
    assert out["step"] == 7

    x = np.random.RandomState(2).uniform(-1, 1, (1, T, 1)).astype(np.float32)
    with torch.no_grad():
        ref_zs = ref.encode(torch.from_numpy(x))
    our_zs = ours.encode(out["params"], out["state"], jnp.asarray(x))
    for rz, oz in zip(ref_zs, our_zs):
        np.testing.assert_array_equal(rz.numpy(), np.asarray(oz))


# --- native checkpoint durability -------------------------------------------

def _payload(step):
    return {"step": step, "params": {"w": np.full((4, 4), float(step))}}


def test_atomic_save_survives_crash_mid_write(tmp_path, monkeypatch):
    """A process killed mid-save (simulated: pickle.dump writes partial bytes
    then dies) must leave the previous checkpoint_latest intact."""
    path = str(tmp_path / "checkpoint_latest")
    save_checkpoint(path, _payload(1))

    def dying_dump(obj, f, protocol=None):
        f.write(b"\x80\x04partial-garbage")
        raise KeyboardInterrupt("simulated preemption mid-save")

    import jukebox_tpu.utils.checkpoints as cp
    monkeypatch.setattr(cp.pickle, "dump", dying_dump)
    with pytest.raises(KeyboardInterrupt):
        save_checkpoint(path, _payload(2))
    monkeypatch.undo()

    loaded = load_checkpoint(path)
    assert loaded["step"] == 1
    np.testing.assert_array_equal(loaded["params"]["w"], np.full((4, 4), 1.0))


def test_stale_tmp_does_not_break_next_save(tmp_path):
    path = str(tmp_path / "checkpoint_latest")
    with open(path + ".tmp", "wb") as f:
        f.write(b"leftover from a crashed run")
    save_checkpoint(path, _payload(3))
    assert load_checkpoint(path)["step"] == 3
    # the tmp file was consumed by the rename, not left behind
    assert not os.path.exists(path + ".tmp")


def test_truncated_checkpoint_fails_loudly(tmp_path):
    path = str(tmp_path / "checkpoint_latest")
    save_checkpoint(path, _payload(4))
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(size // 2)
    with pytest.raises((pickle.UnpicklingError, EOFError)):
        load_checkpoint(path)
