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

    # the native libav loader would otherwise intercept (and rightly
    # reject) the fake mp3 — this test covers the CLI fallback tier
    import jukebox_tpu.utils.io as io_mod
    monkeypatch.setattr(io_mod, "_have_native_av", lambda: False)

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


# --- fuzz: corrupt/truncated bytes through the native loader -----------------

def test_fuzz_corrupt_wav_bytes(tmp_path, wav_file):
    """Malformed wav files must fail cleanly (probe -> None or a bounded
    zero-filled read), never crash the C loader or poison load_audio."""
    path, _ = wav_file
    with open(path, "rb") as f:
        good = f.read()
    cases = {
        "empty": b"",
        "header_only_10b": good[:10],
        "riff_no_chunks": good[:12],
        "bad_magic": b"XXXX" + good[4:],
        "bad_wave_tag": good[:8] + b"NOPE" + good[12:],
        "fmt_truncated": good[:30],
        "data_truncated": good[: len(good) // 3],
        "garbage": bytes(range(256)) * 64,
        "huge_declared_size": good[:40] + b"\xff\xff\xff\x7f" + good[44:64],
    }
    for name, blob in cases.items():
        p = str(tmp_path / f"{name}.wav")
        with open(p, "wb") as f:
            f.write(blob)
        info = wavio.probe(p)  # must not crash
        w = wavio.read_window(p, 0, 64)  # must not crash either
        if w is not None:
            assert w.shape[1] == 64 and np.isfinite(w).all(), name
        if info is not None:
            # header parsed (e.g. only the data bytes are truncated): the
            # full loader path must still produce a finite, full-size window
            x, sr = load_audio(p, sr=info["sample_rate"], offset=0,
                               duration=128)
            assert x.shape == (2, 128) and np.isfinite(x).all(), name


def test_fuzz_data_truncated_zero_fills(tmp_path, wav_file):
    """A file whose data chunk is cut short (disk-full copy) reads the real
    frames and zero-fills the missing tail instead of failing."""
    path, sig = wav_file
    with open(path, "rb") as f:
        good = f.read()
    cut = str(tmp_path / "cut.wav")
    keep_frames = 1000
    with open(cut, "wb") as f:
        f.write(good[: 44 + keep_frames * 4])  # 2ch x int16
    w = wavio.read_window(cut, 0, 2048)
    if w is None:  # pure-python fallback handles it via wave module
        pytest.skip("native loader unavailable")
    assert w.shape == (2, 2048)
    expect = np.round(sig.T[:, :keep_frames] * 32767) / 32768
    np.testing.assert_allclose(w[:, :keep_frames], expect, atol=1e-4)
    assert (w[:, keep_frames + 4:] == 0).all()


# --- ffmpeg-CLI fallback decode path ------------------------------------------
# Real-bytes compressed round-trips live in tests/test_avio.py (native
# libav loader). This covers the third load_audio route —
# _load_ffmpeg_window, used on deployments with an ffmpeg binary but
# neither the native .so nor PyAV — with a fixture encoded by avio.

def _real_ffmpeg():
    import shutil
    return shutil.which("ffmpeg") is not None


@pytest.mark.skipif(not _real_ffmpeg(), reason=(
    "no ffmpeg binary in this zero-egress image; the native-loader mp3 "
    "round-trip in tests/test_avio.py covers the decode contract here"))
def test_ffmpeg_cli_fallback_mp3(tmp_path, wav_file, monkeypatch):
    from jukebox_tpu.utils import avio, io as jio

    path, sig = wav_file
    mp3 = str(tmp_path / "clip.mp3")
    assert avio.encode(mp3, sig.T, 8000)
    monkeypatch.setattr(jio, "_have_native_av", lambda: False)
    monkeypatch.setattr(jio, "_have_av", lambda: False)
    x, sr = jio.load_audio(mp3, sr=8000, offset=0, duration=4096)
    assert sr == 8000 and x.shape == (2, 4096)
    # lossy codec + encoder delay: align by cross-correlation, then demand
    # high correlation with the source
    ref = sig.T[0]
    best = max(
        (float(np.corrcoef(x[0, lag:lag + 2048], ref[:2048])[0, 1]), lag)
        for lag in range(0, 1200, 8))
    assert best[0] > 0.8, f"decoded audio uncorrelated with source: {best}"
    assert abs(get_duration_sec(mp3) - 2.0) < 0.2
