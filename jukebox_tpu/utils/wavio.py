"""ctypes binding for the native wav window loader (csrc/wavio.cpp) with a
pure-Python fallback. The C path releases the GIL, so the thread-pool data
loader scales with nworkers (the reference gets this from PyAV's C core,
utils/io.py:20-57)."""

import ctypes
import os

import numpy as np

_LIB = None


class _WavInfo(ctypes.Structure):
    _fields_ = [("sample_rate", ctypes.c_int32),
                ("channels", ctypes.c_int32),
                ("bits", ctypes.c_int32),
                ("format", ctypes.c_int32),  # 1 = int PCM, 3 = IEEE float
                ("n_frames", ctypes.c_int64),
                ("data_offset", ctypes.c_int64)]


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      "csrc", "_wavio.so")
    if not os.path.exists(so):
        try:
            from jukebox_tpu.csrc.build_wavio import build
            so = build()
        except Exception:
            _LIB = False
            return _LIB
    try:
        lib = ctypes.CDLL(so)
        lib.wav_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
        lib.wav_probe.restype = ctypes.c_int
        lib.wav_read_window.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
        lib.wav_read_window.restype = ctypes.c_int64
        lib.resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32]
        lib.resample_linear.restype = None
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


def available():
    return bool(_load_lib())


def probe(path):
    """Returns dict(sample_rate, channels, bits, n_frames) or None."""
    lib = _load_lib()
    if not lib:
        return None
    info = _WavInfo()
    if lib.wav_probe(path.encode(), ctypes.byref(info)) != 0:
        return None
    return dict(sample_rate=info.sample_rate, channels=info.channels,
                bits=info.bits, format=info.format, n_frames=info.n_frames)


def read_window(path, start, n_frames, out_channels=2, target_sr=None):
    """Read [start, start+n_frames) frames as float32 [out_channels, n].
    start/n_frames are in *file* frames; pass target_sr to resample the
    result to round(n_frames * target_sr / file_sr) frames."""
    lib = _load_lib()
    if not lib:
        return None
    out = np.zeros((out_channels, n_frames), dtype=np.float32)
    got = lib.wav_read_window(
        path.encode(), int(start), int(n_frames),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_channels)
    if got < 0:
        return None
    if target_sr is not None:
        info = probe(path)
        if info and info["sample_rate"] != target_sr:
            n_out = int(round(n_frames * target_sr / info["sample_rate"]))
            res = np.zeros((out_channels, n_out), dtype=np.float32)
            lib.resample_linear(
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_frames,
                res.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
                out_channels)
            return res
    return out
