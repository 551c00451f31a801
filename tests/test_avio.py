"""Native compressed-audio decode (csrc/avio.cpp) against real mp3/ogg/flac
bytes. The reference trains off PyAV-decoded mp3/opus/m4a/aac windows
(jukebox/utils/io.py:20-57); this image has no ffmpeg CLI and no `av`
package, but it does ship the ffmpeg *libraries* — avio.cpp drives
libavformat/libavcodec/libswresample directly. Fixtures are encoded
in-test with the same library (jav_encode), so the decode path is
exercised on genuine compressed containers, not shims."""

import numpy as np
import pytest

from jukebox_tpu.utils import avio
from jukebox_tpu.utils.io import get_duration_sec, load_audio

pytestmark = pytest.mark.skipif(
    not avio.available(), reason="ffmpeg shared libraries not present")

SR = 22050


@pytest.fixture(scope="module")
def signal():
    t = np.arange(SR * 3) / SR
    return np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                     0.5 * np.sin(2 * np.pi * 660 * t)]).astype(np.float32)


@pytest.fixture(scope="module", params=["mp3", "ogg", "flac"])
def encoded(request, tmp_path_factory, signal):
    path = str(tmp_path_factory.mktemp("av") / f"fix.{request.param}")
    assert avio.encode(path, signal, SR), f"{request.param} encode failed"
    return request.param, path


# per-codec tolerance: flac is lossless; vorbis is near-transparent at
# 128k; mp3 adds ~0.016 mean abs error on a 0.35-rms sine
TOL = {"flac": 1e-4, "ogg": 0.01, "mp3": 0.03}


def test_probe_duration(encoded, signal):
    ext, path = encoded
    info = avio.probe(path)
    assert info["sample_rate"] == SR and info["channels"] == 2
    assert abs(info["duration_sec"] - 3.0) < 0.1


def test_duration_sidecar_cache(encoded, tmp_path):
    ext, path = encoded
    dur = get_duration_sec(path, cache=True)
    assert abs(dur - 3.0) < 0.1
    # second call must come from the .dur sidecar (reference io.py:6-18)
    with open(path + ".dur") as f:
        assert abs(float(f.read()) - dur) < 1e-9


@pytest.mark.parametrize("offset", [0, 500, 5000, SR, 2 * SR + 123])
def test_window_sample_accurate(encoded, signal, offset):
    """Seek+decode at arbitrary offsets is sample-aligned for every codec
    (incl. mp3 initial-padding/pre-roll handling)."""
    ext, path = encoded
    win = avio.read_window(path, offset, 2048, SR)
    ref = signal[:, offset:offset + 2048]
    assert float(np.abs(win[:, :ref.shape[1]] - ref).mean()) < TOL[ext]


def test_load_audio_native_path(encoded, signal):
    """utils.io.load_audio routes non-wav files through the native decoder
    and honours the [2, duration] float32 contract."""
    ext, path = encoded
    sig, sr = load_audio(path, sr=SR, offset=SR, duration=4096)
    assert sr == SR and sig.shape == (2, 4096) and sig.dtype == np.float32
    ref = signal[:, SR:SR + 4096]
    assert float(np.abs(sig - ref).mean()) < TOL[ext]


def test_load_audio_resampled(encoded, signal):
    """Decode at half rate: swresample converts in-kernel; energy is
    preserved and the window maps to the right source region."""
    ext, path = encoded
    half = SR // 2
    sig, sr = load_audio(path, sr=half, offset=half, duration=1024)
    assert sig.shape == (2, 1024)
    # 440 Hz tone resampled to 11025 Hz is still a 440 Hz tone: compare rms
    ref = signal[0, SR:SR + 2048]
    assert abs(float(np.sqrt((sig[0] ** 2).mean())) -
               float(np.sqrt((ref ** 2).mean()))) < 0.05


def test_window_past_eof_zero_filled(encoded):
    ext, path = encoded
    win = avio.read_window(path, 3 * SR - 100, 1000, SR)
    assert win.shape == (2, 1000)
    assert float(np.abs(win[:, 300:]).max()) == 0.0
    assert float(np.abs(win[:, :100]).mean()) > 0.01


def test_corrupt_file_rejected(tmp_path):
    bad = str(tmp_path / "bad.mp3")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 64)
    assert avio.probe(bad) is None or avio.probe(bad)["duration_sec"] == 0.0


def test_dataset_over_compressed_audio(encoded, signal, tmp_path):
    """FilesAudioDataset virtual-concat windows decode through the native
    path end-to-end (reference files_dataset.py:49-65 over mp3 corpora)."""
    ext, path = encoded
    from jukebox_tpu.data.files_dataset import FilesAudioDataset
    from jukebox_tpu.hparams import setup_hparams
    import shutil

    d = tmp_path / "corpus"
    d.mkdir()
    shutil.copy(path, d / f"a.{ext}")
    hps = setup_hparams("teeny", dict(
        audio_files_dir=str(d), sr=SR, sample_length=8192, min_duration=0,
        max_duration=None, labels=False, aug_shift=False))
    ds = FilesAudioDataset(hps)
    assert len(ds) >= 1
    item = ds[0]
    x = np.asarray(item, np.float32)
    assert x.shape[0] == 8192 and float(np.abs(x).mean()) > 0.01
