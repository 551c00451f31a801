"""Host-side input pipeline (equivalent of jukebox/data/data_processor.py).

Replaces torch DataLoader + DistributedSampler with:
  * deterministic per-epoch shuffled index streams sharded by jax process
    (each host reads only its shard of the global batch),
  * a thread-pool prefetcher decoding audio windows ahead of the step.
"""

import concurrent.futures as futures

import numpy as np

from jukebox_tpu.data.files_dataset import FilesAudioDataset
from jukebox_tpu.utils.audio_utils import calculate_bandwidth


class OffsetView:
    """Train/test split as an offset view (data_processor.py:9-22)."""

    def __init__(self, dataset, start, end, test=False):
        self.dataset = dataset
        self.start, self.end, self.test = start, end, test
        assert 0 <= start < end <= len(dataset)

    def __len__(self):
        return self.end - self.start

    def __getitem__(self, item):
        return self.dataset.get_item(self.start + item, test=self.test)

    @property
    def sr(self):
        return self.dataset.sr


class ShardedLoader:
    """Deterministic epoch-shuffled, process-sharded, prefetching batch
    loader. Yields numpy batches [local_bs, T, C] (+ labels)."""

    def __init__(self, view, bs, shuffle=True, drop_last=True, nworkers=2,
                 seed=0):
        import jax
        self.view = view
        self.bs = bs
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.nworkers = max(1, nworkers)
        self.seed = seed
        self.epoch = 0
        self.proc = jax.process_index()
        self.nproc = jax.process_count()

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.view)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # shard across processes (each host loads its slice of the global batch)
        per = n // self.nproc if self.drop_last else -(-n // self.nproc)
        return idx[self.proc::self.nproc][:per]

    def __len__(self):
        per = len(self._indices())
        return per // self.bs if self.drop_last else -(-per // self.bs)

    def __iter__(self):
        idx = self._indices()
        n_batches = len(self)
        batches = [idx[i * self.bs:(i + 1) * self.bs] for i in range(n_batches)]

        def fetch(batch_idx):
            items = [self.view[int(i)] for i in batch_idx]
            if isinstance(items[0], tuple):
                xs = np.stack([it[0] for it in items])
                ys = np.stack([it[1] for it in items])
                return xs, ys
            return np.stack(items)

        with futures.ThreadPoolExecutor(self.nworkers) as pool:
            pending = []
            it = iter(batches)
            for _ in range(min(2 * self.nworkers, n_batches)):
                pending.append(pool.submit(fetch, next(it)))
            for b in batches[len(pending):] + [None] * len(pending):
                done = pending.pop(0)
                if b is not None:
                    pending.append(pool.submit(fetch, b))
                yield done.result()


class DataProcessor:
    def __init__(self, hps):
        self.dataset = FilesAudioDataset(hps)
        duration = 1 if hps.prior else 600
        hps.bandwidth = calculate_bandwidth(self.dataset, hps, duration=duration)
        train_len = int(len(self.dataset) * hps.train_test_split)
        self.train_dataset = OffsetView(self.dataset, 0, train_len, test=False)
        self.test_dataset = OffsetView(self.dataset, train_len,
                                       len(self.dataset), test=True)
        self.train_loader = ShardedLoader(self.train_dataset, hps.bs,
                                          shuffle=True, drop_last=True,
                                          nworkers=hps.nworkers,
                                          seed=hps.get("seed", 0))
        self.test_loader = ShardedLoader(self.test_dataset, hps.bs,
                                         shuffle=False, drop_last=False,
                                         nworkers=hps.nworkers,
                                         seed=hps.get("seed", 0))
        print(f"Train {len(self.train_dataset)} samples. "
              f"Test {len(self.test_dataset)} samples")

    def set_epoch(self, epoch):
        self.dataset.set_epoch(epoch)
        self.train_loader.set_epoch(epoch)
        self.test_loader.set_epoch(epoch)
