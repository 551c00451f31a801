"""ctypes binding for the native compressed-audio loader (csrc/avio.cpp).

Drives the system ffmpeg libraries (libavformat/libavcodec/libswresample)
directly from C++ — the same decode core the reference reaches through
PyAV (jukebox/utils/io.py:20-57): probe duration, seek to a sample
window, decode, resample to target-rate stereo float. One C call per
window releases the GIL for the whole decode, so loader threads scale.

Also exposes `encode()` (mp3/ogg/flac by extension) so tests can create
real compressed fixtures without an ffmpeg CLI."""

import ctypes
import os

import numpy as np

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      "csrc", "_avio.so")
    if not os.path.exists(so):
        try:
            from jukebox_tpu.csrc.build_avio import available, build
            if not available():
                _LIB = False
                return _LIB
            so = build()
        except Exception:
            _LIB = False
            return _LIB
    try:
        lib = ctypes.CDLL(so)
        lib.jav_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.jav_probe.restype = ctypes.c_int
        lib.jav_read_window.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float)]
        lib.jav_read_window.restype = ctypes.c_int64
        lib.jav_encode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32]
        lib.jav_encode.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


def available():
    return bool(_load_lib())


def probe(path):
    """Returns dict(duration_sec, sample_rate, channels) or None."""
    lib = _load_lib()
    if not lib:
        return None
    dur = ctypes.c_double()
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    if lib.jav_probe(path.encode(), ctypes.byref(dur), ctypes.byref(sr),
                     ctypes.byref(ch)) != 0:
        return None
    return dict(duration_sec=dur.value, sample_rate=sr.value,
                channels=ch.value)


def read_window(path, offset, n, target_sr):
    """Decode [offset, offset+n) samples (at target_sr) as float32 [2, n].
    Seeks to the containing keyframe and drops up to the exact offset;
    short reads past EOF are zero-filled. Returns None on failure."""
    lib = _load_lib()
    if not lib:
        return None
    out = np.zeros((2, n), dtype=np.float32)
    got = lib.jav_read_window(
        path.encode(), int(offset), int(n), int(target_sr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got < 0:
        return None
    return out


def encode(path, data, sr):
    """Encode float32 [C, T] (or [T]) to `path`; codec from the extension
    (mp3 -> lame, ogg -> vorbis, flac -> flac). Returns True on success."""
    lib = _load_lib()
    if not lib:
        return False
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 1:
        data = data[None]
    interleaved = np.ascontiguousarray(data.T)  # [T, C]
    rc = lib.jav_encode(
        path.encode(),
        interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(interleaved.shape[0]), int(interleaved.shape[1]), int(sr))
    return rc == 0
