"""Windowed-sampling orchestration invariants with a fake prior (the
reference's DummyPrior pattern, jukebox/tests/test_sample.py): the hop/window
stitching machinery is exercised without any model. Ancestral stitching must
produce arange(total_length); primed sampling must preserve the prime and
continue the sequence; cross-level consistency z//4 == z_cond must hold."""

import numpy as np

from jukebox_tpu.hparams import Hyperparams
from jukebox_tpu.sample import sample_level


def repeat(x, n):
    return np.repeat(x, n, axis=1)


class DummyPrior:
    """Arithmetic-sequence fake prior (test_sample.py:13-64)."""

    def __init__(self, n_ctx, level, levels):
        self.n_ctx = n_ctx
        self.level = level
        self.levels = levels
        self.downsamples = (8, 4, 4)
        self.cond_downsample = (self.downsamples[level + 1]
                                if level != levels - 1 else None)
        self.raw_to_tokens = int(np.prod(self.downsamples[: level + 1]))
        self.sample_length = self.n_ctx * self.raw_to_tokens

    def get_y(self, labels, start):
        y = np.array(labels["y"], copy=True)
        y[:, 2] = self.sample_length
        y[:, 1:2] = y[:, 1:2] + start * self.raw_to_tokens
        return y

    def get_z_conds(self, zs, start, end):
        if self.level != self.levels - 1:
            assert start % self.cond_downsample == end % self.cond_downsample == 0
            z_cond = zs[self.level + 1][:, start // self.cond_downsample:
                                        end // self.cond_downsample]
            assert z_cond.shape[1] == self.n_ctx // self.cond_downsample
            return [z_cond]
        return None

    def sample(self, n_samples, z=None, z_conds=None, y=None, rng=None,
               sample_tokens=None, **kwargs):
        if z is None or z.shape[1] == 0:
            out = np.tile(np.arange(self.n_ctx, dtype=np.int64), (n_samples, 1))
        else:
            prime = z.shape[1]
            start = z[:, -1:] + 1
            z_rest = np.arange(self.n_ctx - prime, dtype=np.int64)[None] + start
            out = np.concatenate([z, z_rest], axis=1)
        if z_conds is not None:
            z_cond = np.asarray(z_conds[0])
            assert z_cond.shape == (n_samples, self.n_ctx // 4)
            assert (out // 4 == repeat(z_cond, 4)).all()
        return out


def make_setup():
    n_ctx, n_samples, levels = 8192, 4, 3
    priors = [DummyPrior(n_ctx, level, levels) for level in range(levels)]
    max_total_length, offset, sample_length = 4134368, 0, n_ctx * 8 * 4 * 4
    y = np.tile(np.array([max_total_length, offset, sample_length, 10, 1,
                          -1, -1, -1, -1], dtype=np.int64), (n_samples, 1))
    labels = [dict(y=y, info=[[]] * n_samples) for _ in range(levels)]
    hps = Hyperparams(levels=3, sample_length=sample_length, n_segment=2,
                      n_ctx=n_ctx, n_tokens=0,
                      hop_lengths=[n_ctx // 2, n_ctx // 2, n_ctx // 8],
                      n_samples=n_samples, use_tokens=False)
    return priors, labels, hps


def _run_cascade(zs, labels, priors, hps):
    kwargs = dict(max_batch_size=hps.n_samples)
    for level in reversed(range(hps.levels)):
        prior = priors[level]
        total_length = (hps.sample_length * hps.n_segment) // prior.raw_to_tokens
        hop_length = hps.hop_lengths[level]
        zs = sample_level(zs, labels[level], dict(kwargs), level, prior,
                          total_length, hop_length, hps, rng=None)
    return zs


def test_ancestral_window_stitching():
    priors, labels, hps = make_setup()
    zs = [np.zeros((hps.n_samples, 0), dtype=np.int64) for _ in range(hps.levels)]
    zs = _run_cascade(zs, labels, priors, hps)
    for z in zs:
        total_length = z.shape[1]
        assert (z == np.arange(total_length, dtype=np.int64)[None]).all()


def test_primed_window_stitching():
    priors, labels, hps = make_setup()
    start = np.array([15, 23, 11, 9], dtype=np.int64).reshape(4, 1)

    zs_in, zs = [], []
    for i in reversed(range(3)):
        n_ctx = 8192 * (4 ** i)
        n_prime = n_ctx // 4
        z_prime = (np.arange(n_prime, dtype=np.int64)[None] % (2 * (4 ** i)))
        z_rest = np.random.randint(-10, -1, size=(1, n_ctx - n_prime)).astype(np.int64)
        z_in = np.concatenate([z_prime, z_rest], axis=1) + (4 ** i) * start
        zs_in.append(z_in)
        zs.append(z_prime + (4 ** i) * start)

    zs = _run_cascade(zs, labels, priors, hps)

    for z, z_in in zip(zs, zs_in):
        total_length = z.shape[1]
        prime_length = z.shape[1] // (4 * hps.n_segment)
        assert (z[:, :prime_length] == z_in[:, :prime_length]).all()
        z_rest = z[:, prime_length - 1:] - z[:, prime_length - 1:prime_length]
        expect = np.arange(total_length - prime_length + 1, dtype=np.int64)[None]
        assert (z_rest == expect).all()
