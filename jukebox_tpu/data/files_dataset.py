"""Virtual-concatenation audio dataset (equivalent of
jukebox/data/files_dataset.py): item i maps to window
[i*sample_length, (i+1)*sample_length) of the concatenated corpus with
optional +-sample_length/2 random aug_shift and song-boundary clamping
(files_dataset.py:49-65)."""

import math
import os

import numpy as np

from jukebox_tpu.data.labels import Labeller
from jukebox_tpu.utils.io import get_duration_sec, load_audio

AUDIO_EXTS = (".mp3", ".opus", ".m4a", ".aac", ".wav", ".ogg", ".flac")


def find_files(root, exts=AUDIO_EXTS):
    out = []
    for dirpath, _, filenames in os.walk(root, followlinks=True):
        for name in filenames:
            if name.lower().endswith(exts):
                out.append(os.path.join(dirpath, name))
    return sorted(out)


class FilesAudioDataset:
    def __init__(self, hps):
        self.sr = hps.sr
        self.channels = hps.channels
        self.min_duration = hps.min_duration or math.ceil(hps.sample_length / hps.sr)
        self.max_duration = hps.max_duration or math.inf
        self.sample_length = hps.sample_length
        assert hps.sample_length / hps.sr < self.min_duration, \
            f"Sample length {hps.sample_length} per sr {hps.sr} should be " \
            f"shorter than min duration {self.min_duration}"
        self.aug_shift = hps.aug_shift
        self.labels = hps.labels
        self.seed = int(hps.get("seed", 0))
        self.epoch = 0
        self.init_dataset(hps)

    def set_epoch(self, epoch):
        """Advance the augmentation stream. aug_shift draws are seeded per
        (seed, epoch, item), so the input stream is reproducible regardless
        of loader thread scheduling — unlike the reference, whose per-worker
        np.random draws depend on worker scheduling
        (jukebox/data/files_dataset.py:52)."""
        self.epoch = int(epoch)

    def filter(self, files, durations):
        keep = [i for i in range(len(files))
                if self.min_duration <= durations[i] / self.sr < self.max_duration]
        print(f"Keeping {len(keep)} of {len(files)} files")
        self.files = [files[i] for i in keep]
        self.durations = [int(durations[i]) for i in keep]
        self.cumsum = np.cumsum(self.durations)

    def init_dataset(self, hps):
        files = find_files(hps.audio_files_dir)
        print(f"Found {len(files)} files. Getting durations")
        import jax
        cache = jax.process_index() == 0
        durations = np.array([get_duration_sec(f, cache=cache) * self.sr
                              for f in files])
        self.filter(files, durations)
        if self.labels:
            self.labeller = Labeller(hps.max_bow_genre_size, hps.n_tokens,
                                     self.sample_length, v3=hps.labels_v3)

    def get_index_offset(self, item):
        """Map item -> (song index, offset in song), centring aug shifts and
        clamping to song boundaries (files_dataset.py:49-65)."""
        half_interval = self.sample_length // 2
        if self.aug_shift:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch, int(item)]))
            shift = int(rng.integers(-half_interval, half_interval))
        else:
            shift = 0
        offset = item * self.sample_length + shift
        midpoint = offset + half_interval
        assert 0 <= midpoint < self.cumsum[-1]
        index = np.searchsorted(self.cumsum, midpoint)
        start = self.cumsum[index - 1] if index > 0 else 0.0
        end = self.cumsum[index]
        assert start <= midpoint <= end
        if offset > end - self.sample_length:
            offset = max(start, offset - half_interval)
        elif offset < start:
            offset = min(end - self.sample_length, offset + half_interval)
        assert start <= offset <= end - self.sample_length
        return index, int(offset - start)

    def get_metadata(self, filename, test):
        """Override for labelled datasets: return (artist, genre, lyrics)."""
        return None, None, None

    def get_song_chunk(self, index, offset, test=False):
        filename, total_length = self.files[index], self.durations[index]
        data, sr = load_audio(filename, sr=self.sr, offset=offset,
                              duration=self.sample_length)
        assert data.shape == (self.channels, self.sample_length), \
            f"Expected {(self.channels, self.sample_length)}, got {data.shape}"
        if self.labels:
            artist, genre, lyrics = self.get_metadata(filename, test)
            labels = self.labeller.get_label(artist, genre, lyrics,
                                             total_length, offset)
            return data.T, labels["y"]
        return data.T

    def get_item(self, item, test=False):
        index, offset = self.get_index_offset(item)
        return self.get_song_chunk(index, offset, test)

    def __len__(self):
        return int(np.floor(self.cumsum[-1] / self.sample_length))

    def __getitem__(self, item):
        return self.get_item(item)
