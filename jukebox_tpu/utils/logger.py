"""Training logger + running metrics (equivalent of jukebox/utils/logger.py,
backed by tensorboardX which is available in this image). Metrics computed
inside the pjit-ed step are already global (the loss/metric reductions run
over the sharded batch), so no explicit cross-rank averaging is needed —
the TPU-native analogue of Metrics' all_reduce-per-update (logger.py:50-61).
"""

import os
import sys

import numpy as np

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    tqdm = None


def def_tqdm(x):
    if tqdm is None:
        return x
    return tqdm(x, leave=True, file=sys.stdout,
                bar_format="{n_fmt}/{total_fmt} [{elapsed}<{remaining}, {rate_fmt}{postfix}]")


def get_range(x):
    import jax
    if jax.process_index() == 0:
        return def_tqdm(x)
    return x


class Metrics:
    """Running weighted averages per key (logger.py:117-147)."""

    def __init__(self):
        self.sum = {}
        self.n = {}

    def reset(self):
        self.sum, self.n = {}, {}

    def update(self, tag, val, batch):
        val, batch = float(val), int(batch)
        self.sum[tag] = self.sum.get(tag, 0.0) + val * batch
        self.n[tag] = self.n.get(tag, 0) + batch
        return self.sum[tag] / self.n[tag]

    def avg(self, tag):
        if tag in self.sum:
            return self.sum[tag] / self.n[tag]
        return 0.0


class Logger:
    def __init__(self, logdir, rank=0):
        self.rank = rank
        self.logdir = logdir
        self.iters = 0
        self.works = []
        self._pbar = None
        if rank == 0:
            os.makedirs(logdir, exist_ok=True)
            from tensorboardX import SummaryWriter
            self.sw = SummaryWriter(f"{logdir}/logs")
        else:
            self.sw = None

    def step(self):
        self.iters += 1

    def flush(self):
        if self.sw is not None:
            self.sw.flush()

    def add_scalar(self, tag, val):
        if self.sw is not None:
            self.sw.add_scalar(tag, float(val), self.iters)

    def add_text(self, tag, text):
        if self.sw is not None:
            self.sw.add_text(tag, text, self.iters)

    def add_audios(self, tag, auds, sample_rate=22050, max_len=None, max_log=8):
        if self.sw is None:
            return
        auds = np.asarray(auds)
        for i in range(min(len(auds), max_log)):
            aud = auds[i].squeeze()
            if max_len:
                aud = aud[: max_len * sample_rate]
            try:
                # tensorboardX encodes via soundfile, which may be absent
                self.sw.add_audio(f"{i}/{tag}", aud[:, None], self.iters,
                                  sample_rate)
            except (ImportError, ModuleNotFoundError):
                from scipy.io import wavfile
                d = f"{self.logdir}/audio"
                os.makedirs(d, exist_ok=True)
                pcm = (np.clip(aud, -1, 1) * 32767).astype(np.int16)
                wavfile.write(f"{d}/{tag}_{i}_it{self.iters}.wav",
                              sample_rate, pcm)

    def add_image(self, tag, img):
        if self.sw is not None:
            self.sw.add_image(tag, img, self.iters)

    def get_range(self, loader):
        if self.rank == 0:
            self._pbar = def_tqdm(loader)
        else:
            self._pbar = loader
        return enumerate(self._pbar)

    def close_range(self):
        if self.rank == 0 and self._pbar is not None and tqdm is not None:
            self._pbar.close()

    def set_postfix(self, *args, **kwargs):
        if self.rank == 0 and tqdm is not None and self._pbar is not None:
            self._pbar.set_postfix(*args, **kwargs)


def init_logging(hps, local_rank, rank):
    logdir = f"{hps.local_logdir}/{hps.name}"
    logger = Logger(logdir, rank)
    metrics = Metrics()
    if rank == 0:
        os.makedirs(logdir, exist_ok=True)
        with open(logdir + "/argv.txt", "w") as f:
            f.write(" ".join(sys.argv))
        print(f"Logging to {logdir}")
    return logger, metrics
