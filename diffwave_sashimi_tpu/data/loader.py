"""Batching data loader with epoch shuffling, replica sharding, native
batch decode, and background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler stack
(reference dataloaders/__init__.py:6-28): sharding follows
DistributedSampler semantics (seeded per-epoch permutation, padded to a
multiple of num_replicas, strided shards), drop_last=True batching, and
the 4-worker-process decode is replaced by the native multithreaded batch
decoder (native/fastwav.cpp via data/fastwav.py) with a scipy fallback,
plus a one-batch-deep background prefetch thread."""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional

import numpy as np

from . import fastwav
from .mel2samp import Mel2Samp
from .sc09 import SpeechCommands
from .wav import MAX_WAV_VALUE


class DataLoader:
    def __init__(self, dataset, batch_size: int, num_replicas: int = 1,
                 replica_id: int = 0, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.num_replicas = int(num_replicas)
        self.replica_id = int(replica_id)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def _shard_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            idx = np.random.RandomState(self.seed + epoch).permutation(n)
        else:
            idx = np.arange(n)
        # DistributedSampler: pad to a multiple of num_replicas by
        # wrapping, then stride (reference dataloaders/__init__.py:19)
        pad = (-len(idx)) % self.num_replicas
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
        return idx[self.replica_id::self.num_replicas]

    def __len__(self) -> int:
        shard = (len(self.dataset) + self.num_replicas - 1) \
            // self.num_replicas
        if self.drop_last:
            return shard // self.batch_size
        return (shard + self.batch_size - 1) // self.batch_size

    def _collate(self, indices: List[int], epoch: int):
        ds = self.dataset
        if isinstance(ds, SpeechCommands) and fastwav.available():
            paths = [ds.path(i) for i in indices]
            out, srs, lens, status = fastwav.decode_batch(
                paths, ds.segment_length, scale=1.0 / MAX_WAV_VALUE)
            for j in np.nonzero(status)[0]:     # scipy fallback per failure
                out[j] = ds[indices[j]][0][0]
                srs[j] = ds[indices[j]][1]
            wavs = out[:, None, :]
            labels = [ds.label(i) for i in indices]
            return wavs, srs, labels
        items = [ds[i] for i in indices]
        if isinstance(ds, Mel2Samp):
            mel = np.stack([it[0] for it in items])
            audio = np.stack([it[1] for it in items])
            return mel, audio
        wavs = np.stack([it[0] for it in items])
        srs = np.asarray([it[1] for it in items])
        labels = [it[2] for it in items]
        return wavs, srs, labels

    def _batches(self, epoch: int):
        idx = self._shard_indices(epoch)
        bs = self.batch_size
        end = (len(idx) // bs) * bs if self.drop_last else len(idx)
        for s in range(0, end, bs):
            yield [int(i) for i in idx[s:s + bs]]

    def __iter__(self) -> Iterator:
        epoch = self.epoch
        self.epoch += 1
        if self.prefetch <= 0:
            for b in self._batches(epoch):
                yield self._collate(b, epoch)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        DONE = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put: a consumer that abandons the iterator mid-epoch
            # (train loop hitting n_iters, a test tearing down) must not
            # leave this thread blocked on a full queue forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in self._batches(epoch):
                    if not _put(self._collate(b, epoch)):
                        return
            finally:
                _put(DONE)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is DONE:
                    break
                yield item
        finally:
            stop.set()
            while True:     # unblock a producer stuck in put()
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)


def dataloader(dataset_cfg, batch_size: int, num_replicas: int = 1,
               replica_id: int = 0, unconditional: bool = True,
               num_gpus: Optional[int] = None, seed: int = 0) -> DataLoader:
    """Dataset factory + loader (reference dataloaders/__init__.py:6-28).

    ``num_gpus`` is accepted as a deprecated alias of ``num_replicas``
    (the reference's argument name)."""
    if num_gpus is not None:
        num_replicas = num_gpus
    cfg = dict(dataset_cfg)
    name = cfg.pop("_name_", "sc09")
    if unconditional or name in ("sc09", "sc", "speechcommands"):
        ds = SpeechCommands(
            cfg["data_path"],
            segment_length=cfg.get("segment_length", 16000),
            sampling_rate=cfg.get("sampling_rate", 16000))
    else:
        ds = Mel2Samp(**cfg)
    return DataLoader(ds, batch_size, num_replicas=num_replicas,
                      replica_id=replica_id, seed=seed)


__all__ = ["DataLoader", "dataloader"]
