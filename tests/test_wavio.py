"""Native (C++) wav window loader vs scipy ground truth."""

import numpy as np
import pytest
from scipy.io import wavfile

from jukebox_tpu.utils import wavio
from jukebox_tpu.utils.io import get_duration_sec, load_audio


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wav") / "test.wav")
    sr = 8000
    t = np.arange(sr * 2) / sr
    sig = np.stack([np.sin(2 * np.pi * 440 * t), np.cos(2 * np.pi * 330 * t)], 1)
    wavfile.write(path, sr, (sig * 32767).astype(np.int16))
    return path, sig.astype(np.float32)


def test_native_available():
    assert wavio.available(), "native _wavio.so should build with g++"


def test_probe(wav_file):
    path, sig = wav_file
    info = wavio.probe(path)
    assert info == dict(sample_rate=8000, channels=2, bits=16, format=1,
                        n_frames=16000)


def test_float32_wav(tmp_path):
    # fmt-3 IEEE-float wavs must decode as raw floats, not int32 PCM
    path = str(tmp_path / "f32.wav")
    sr = 8000
    t = np.arange(sr) / sr
    sig = np.stack([np.sin(2 * np.pi * 220 * t),
                    np.cos(2 * np.pi * 550 * t)], 1).astype(np.float32)
    wavfile.write(path, sr, sig)
    info = wavio.probe(path)
    assert info == dict(sample_rate=8000, channels=2, bits=32, format=3,
                        n_frames=8000)
    w = wavio.read_window(path, 50, 128)
    np.testing.assert_allclose(w, sig.T[:, 50:178], atol=1e-7)


def test_read_window_matches_scipy(wav_file):
    path, sig = wav_file
    w = wavio.read_window(path, 100, 256)
    expect = np.round(sig.T[:, 100:356] * 32767) / 32768
    np.testing.assert_allclose(w, expect, atol=1e-4)


def test_read_past_eof_zero_fills(wav_file):
    path, _ = wav_file
    w = wavio.read_window(path, 15900, 256)
    assert w.shape == (2, 256)
    assert (w[:, 100:] == 0).all()
    assert (np.abs(w[:, :100]) > 0).any()


def test_io_load_audio_uses_native(wav_file):
    path, sig = wav_file
    x, sr = load_audio(path, sr=8000, offset=1000, duration=512)
    assert x.shape == (2, 512) and sr == 8000
    expect = np.round(sig.T[:, 1000:1512] * 32767) / 32768
    np.testing.assert_allclose(x, expect, atol=1e-4)
    assert abs(get_duration_sec(path) - 2.0) < 1e-6


def test_ffmpeg_cli_fallback(tmp_path, monkeypatch):
    """Non-wav decode without PyAV goes through the ffmpeg CLI (seek +
    f32le pipe). This image has no real decoder, so the subprocess plumbing
    is proven with a shim that emits known PCM; on a deployment with real
    ffmpeg the same code path decodes mp3/opus/m4a/aac."""
    import os
    import stat

    sr = 8000
    t = np.arange(sr) / sr
    sig = np.stack([np.sin(2 * np.pi * 100 * t),
                    np.cos(2 * np.pi * 100 * t)], 1).astype(np.float32)
    raw = tmp_path / "pcm.raw"
    raw.write_bytes(sig.astype("<f4").tobytes())  # interleaved stereo f32le

    shim = tmp_path / "ffmpeg"
    shim.write_text(f"#!/bin/sh\ncat {raw}\n")
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    probe = tmp_path / "ffprobe"
    probe.write_text("#!/bin/sh\necho 1.0\n")
    probe.chmod(probe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")

    fake_mp3 = tmp_path / "song.mp3"
    fake_mp3.write_bytes(b"\xff\xfb")  # content irrelevant, shim ignores it

    x, got_sr = load_audio(str(fake_mp3), sr=sr, offset=0, duration=256)
    assert got_sr == sr and x.shape == (2, 256)
    np.testing.assert_allclose(x, sig.T[:, :256], atol=1e-7)
    assert abs(get_duration_sec(str(fake_mp3)) - 1.0) < 1e-6
