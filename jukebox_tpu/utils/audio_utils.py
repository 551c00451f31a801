"""Host-side audio helpers: dataset bandwidth normalisation stats, channel
preprocessing, and wav IO (equivalent of jukebox/utils/audio_utils.py; wav IO
uses scipy/stdlib because soundfile/librosa are not in this image)."""

import os

import numpy as np


def _np_stft_mag(x, n_fft, hop_length, win_length):
    """Magnitude STFT of a 1-D numpy signal with torch/librosa-style
    center=True reflect padding and a periodic Hann window."""
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    left = (n_fft - win_length) // 2
    window = np.zeros(n_fft)
    window[left:left + win_length] = win
    n_frames = 1 + (len(x) - n_fft) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = x[idx] * window
    return np.abs(np.fft.rfft(frames, axis=-1)).T


def calculate_bandwidth(dataset, hps, duration=600):
    """Streaming mean/L1/L2/spectral-norm stats over ~`duration` seconds of
    the dataset; the results normalise the reconstruction losses
    (audio_utils.py:22-56). Deterministic single-host computation — every
    host computes the same stats from the same strided subset."""
    n_fft, hop_length, window_size = 2048, 256, 6 * 256
    sr = dataset.sr
    n_samples = int(sr * duration)
    l1, total, total_sq, n_seen, idx = 0.0, 0.0, 0.0, 0.0, 0
    spec_norm_total, spec_nelem = 0.0, 0.0
    while n_seen < n_samples and idx < len(dataset):
        x = dataset[idx]
        if isinstance(x, (tuple, list)):
            x, _ = x
        samples = np.asarray(x, dtype=np.float64)
        mag = _np_stft_mag(np.mean(samples, axis=1), n_fft, hop_length, window_size)
        spec_norm_total += np.linalg.norm(mag)
        spec_nelem += 1
        n_seen += int(np.prod(samples.shape))
        l1 += np.sum(np.abs(samples))
        total += np.sum(samples)
        total_sq += np.sum(samples ** 2)
        idx += 16

    mean = total / n_seen
    bandwidth = dict(l2=total_sq / n_seen - mean ** 2,
                     l1=l1 / n_seen,
                     spec=spec_norm_total / spec_nelem)
    return bandwidth


def audio_preprocess(x, hps, rng=None):
    """NTC float audio -> NT1: stereo blended to mono, optionally with a
    random per-sample blend (aug_blend, audio_utils.py:58-77)."""
    import jax
    import jax.numpy as jnp
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.shape[-1] == 2:
        if getattr(hps, "aug_blend", False) and rng is not None:
            mix = jax.random.uniform(rng, (x.shape[0], 1))
        else:
            mix = 0.5
        x = mix * x[:, :, 0] + (1 - mix) * x[:, :, 1]
    elif x.shape[-1] == 1:
        x = x[:, :, 0]
    else:
        raise ValueError(f"Got unknown {x.shape[-1]} channels")
    return x[:, :, None]


def audio_postprocess(x, hps):
    return x


def save_wav(fname, aud, sr):
    """Write each batch item as 16-bit PCM wav (audio_utils.py:142-146)."""
    from scipy.io import wavfile
    aud = np.clip(np.asarray(aud), -1, 1)
    os.makedirs(fname, exist_ok=True)
    for i in range(aud.shape[0]):
        pcm = (aud[i] * 32767).astype(np.int16)
        wavfile.write(f"{fname}/item_{i}.wav", sr, pcm)


def load_audio(file, sr, offset, duration, mono=False):
    """Load a [offset, offset+duration) sample window as float32 [C, T].

    wav is read natively (scipy); other codecs require the optional `av`
    package (reference uses librosa/PyAV for mp3/m4a/aac)."""
    if file.lower().endswith(".wav"):
        file_sr, data = _read_wav(file)
        if data.ndim == 1:
            data = data[:, None]
        data = data.T.astype(np.float32)  # [C, T]
        if file_sr != sr:
            data = _resample(data, file_sr, sr)
        x = data[:, int(offset):int(offset + duration)]
        if x.shape[1] < duration:
            x = np.pad(x, ((0, 0), (0, int(duration) - x.shape[1])))
    else:
        x = _load_audio_av(file, sr, offset, duration)
    if mono and x.shape[0] > 1:
        x = np.mean(x, axis=0, keepdims=True)
    return x


def _read_wav(file):
    from scipy.io import wavfile
    file_sr, data = wavfile.read(file)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return file_sr, data


def _resample(x, from_sr, to_sr):
    from scipy.signal import resample_poly
    from math import gcd
    g = gcd(int(from_sr), int(to_sr))
    return resample_poly(x, to_sr // g, from_sr // g, axis=-1).astype(np.float32)


def _load_audio_av(file, sr, offset, duration):
    try:
        import av  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            f"Decoding {file} needs the optional 'av' package (only .wav is "
            f"supported natively in this environment)") from e
    from jukebox_tpu.utils.io import load_audio as _load
    return _load(file, sr=sr, offset=offset, duration=duration)
