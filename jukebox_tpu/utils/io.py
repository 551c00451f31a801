"""Audio file windowed decode + duration probing (equivalent of
jukebox/utils/io.py). wav files are decoded with the stdlib `wave` module
(fast random access via frame seek); other codecs (mp3/ogg/opus/m4a/aac/
flac) go through the native C++ loader (csrc/avio.cpp — drives the system
libavformat/libavcodec/libswresample directly, GIL-free), falling back to
PyAV when the optional `av` package is present, else to the `ffmpeg` CLI
(seek + decode-to-f32le over a pipe). Durations are cached in `.dur`
sidecar files like the reference (io.py:6-18)."""

import math
import os
import shutil
import subprocess
import wave

import numpy as np


def _have_native_av():
    from jukebox_tpu.utils import avio
    return avio.available()


def _have_av():
    try:
        import av
        # a stub module (e.g. injected so the torch reference imports in the
        # parity tests) is not a usable decoder
        return hasattr(av, "open")
    except ImportError:
        return False


def _ffmpeg_bin(name="ffmpeg"):
    return shutil.which(name)


def get_duration_sec(file, cache=False):
    try:
        with open(file + ".dur", "r") as f:
            return float(f.readline().strip("\n"))
    except FileNotFoundError:
        duration = _probe_duration(file)
        if cache:
            with open(file + ".dur", "w") as f:
                f.write(str(duration) + "\n")
        return duration


def _probe_duration(file):
    if file.lower().endswith(".wav"):
        from jukebox_tpu.utils import wavio
        info = wavio.probe(file) if wavio.available() else None
        if info is not None:
            return info["n_frames"] / info["sample_rate"]
        with wave.open(file, "rb") as w:
            return w.getnframes() / w.getframerate()
    if _have_native_av():
        from jukebox_tpu.utils import avio
        info = avio.probe(file)
        if info is not None and info["duration_sec"] > 0:
            return info["duration_sec"]
    if _have_av():
        import av
        container = av.open(file)
        return container.streams.audio[0].duration * float(
            container.streams.audio[0].time_base)
    ffprobe = _ffmpeg_bin("ffprobe")
    if ffprobe:
        out = subprocess.run(
            [ffprobe, "-v", "error", "-show_entries", "format=duration",
             "-of", "default=noprint_wrappers=1:nokey=1", file],
            capture_output=True, check=True)
        return float(out.stdout.strip())
    raise RuntimeError(
        f"cannot probe {file}: non-wav decode needs the `av` package or an "
        f"`ffmpeg`/`ffprobe` binary on PATH (reference io.py:6-18)")


def load_audio(file, sr, offset, duration, resample=True, approx=False,
               time_base="samples", check_duration=True):
    """Decode `duration` samples at `offset` (in samples at rate sr).
    Returns float32 [2, duration] (mono duplicated to stereo, matching the
    reference loader's channel contract, io.py:20-57)."""
    if time_base == "sec":
        offset = offset * sr
        duration = duration * sr
    offset, duration = int(offset), int(duration)

    if file.lower().endswith(".wav"):
        sig, file_sr = _load_wav_window(file, offset, duration, sr)
    elif _have_native_av():
        from jukebox_tpu.utils import avio
        sig = avio.read_window(file, offset, duration, sr)
        if sig is None:
            raise RuntimeError(f"native decode failed for {file}")
        file_sr = sr  # swresample already resampled in-kernel
    elif _have_av():
        sig, file_sr = _load_av_window(file, offset, duration, sr, approx,
                                       check_duration)
    else:
        sig, file_sr = _load_ffmpeg_window(file, offset, duration, sr)
    if resample and file_sr != sr:
        from jukebox_tpu.utils.audio_utils import _resample
        sig = _resample(sig, file_sr, sr)
        sig = sig[:, :duration]
    if sig.shape[1] < duration:
        sig = np.pad(sig, ((0, 0), (0, duration - sig.shape[1])))
    if sig.shape[0] == 1:
        sig = np.concatenate([sig, sig], axis=0)
    return sig[:2], sr


def _load_wav_window(file, offset, duration, sr):
    # native GIL-releasing fast path (csrc/wavio.cpp)
    from jukebox_tpu.utils import wavio
    if wavio.available():
        info = wavio.probe(file)
        if info is not None:
            file_sr = info["sample_rate"]
            start = int(offset * file_sr / sr)
            n = int(math.ceil(duration * file_sr / sr))
            data = wavio.read_window(file, start, max(n, 2),
                                     out_channels=info["channels"])
            if data is not None:
                return data, file_sr
    with wave.open(file, "rb") as w:
        file_sr = w.getframerate()
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        # offset/duration are in target-sr samples; convert to file frames
        start = int(offset * file_sr / sr)
        n = int(math.ceil(duration * file_sr / sr))
        start = min(start, w.getnframes())
        n = min(n, w.getnframes() - start)
        w.setpos(start)
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported sample width {width} in {file}")
    data = data.reshape(-1, n_channels).T  # [C, T]
    return data, file_sr


def _load_ffmpeg_window(file, offset, duration, sr):
    """Decode a window via the ffmpeg CLI: seek to the offset, resample to
    target sr, stream f32le stereo PCM over a pipe (the subprocess fallback
    for images without PyAV; same seek+decode+resample contract as
    reference io.py:20-57)."""
    ffmpeg = _ffmpeg_bin()
    if not ffmpeg:
        raise RuntimeError(
            f"cannot decode {file}: non-wav decode needs the `av` package or "
            f"an `ffmpeg` binary on PATH")
    start_sec = offset / sr
    dur_sec = duration / sr
    cmd = [ffmpeg, "-v", "error", "-ss", f"{start_sec:.6f}", "-i", file,
           "-t", f"{dur_sec + 0.05:.6f}", "-f", "f32le", "-ac", "2",
           "-ar", str(sr), "pipe:1"]
    out = subprocess.run(cmd, capture_output=True, check=True)
    sig = np.frombuffer(out.stdout, dtype=np.float32)
    sig = sig[: 2 * (sig.size // 2)].reshape(-1, 2).T  # interleaved -> [2, T]
    return sig[:, :duration], sr


def _load_av_window(file, offset, duration, sr, approx, check_duration):
    import av
    container = av.open(file)
    audio = container.streams.audio[0]
    audio_duration = audio.duration * float(audio.time_base) * sr
    if approx:
        if offset + duration > audio_duration:
            offset = np.min(audio_duration - duration)
    else:
        if check_duration:
            assert offset + duration <= audio_duration, \
                f"{file}: window [{offset},{offset+duration}] > {audio_duration}"
    resampler = av.AudioResampler(format="fltp", layout="stereo", rate=sr)
    offset_pts = int(offset / sr / float(audio.time_base))
    sig = np.zeros((2, duration), dtype=np.float32)
    container.seek(offset_pts, stream=audio)
    total_read = 0
    for frame in container.decode(audio=0):
        frame.pts = None
        resampled = resampler.resample(frame)
        if not isinstance(resampled, list):
            resampled = [resampled]
        for f in resampled:
            frame_np = f.to_ndarray(format="fltp")
            read = frame_np.shape[-1]
            if total_read + read > duration:
                read = duration - total_read
            sig[:, total_read:total_read + read] = frame_np[:, :read]
            total_read += read
            if total_read == duration:
                return sig, sr
    assert total_read <= duration, f"Expected {duration}, got {total_read}"
    return sig, sr
