"""Prefetching batch loader — the host side of the input pipeline, replacing
torch's ``DataLoader`` + timm ``PrefetchLoader`` (``timm1/data/loader.py:
76,189``; reference builds them at ``main.py:247-287``).

Design (TPU-first):
  * a thread pool decodes + transforms samples (PIL/numpy release the GIL
    for the heavy ops), assembling pinned numpy batches;
  * a small prefetch queue keeps batches ready so the device never waits —
    device placement (and the H2D copy) happens in
    :func:`device_prefetch`, overlapping the next batch's transfer with the
    current step's compute (the reference's CUDA-stream prefetch analog);
  * per-epoch shuffling with a seeded RNG and DistributedSampler-style
    shard-by-rank slicing (``main.py:247-259``): every host sees an equal
    number of batches, padding by wrap-around like torch's sampler.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Tuple

import numpy as np


class BatchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 8, seed: int = 0,
                 rank: int = 0, world_size: int = 1,
                 prefetch_batches: int = 4):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.prefetch = prefetch_batches
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """DistributedSampler.set_epoch equivalent — reseeds the shuffle."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.ds)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.world_size > 1:
            # pad by wrap-around so every rank gets equal batches
            per = -(-n // self.world_size)
            padded = np.concatenate([idx, idx[:per * self.world_size - n]])
            idx = padded[self.rank::self.world_size]
        return idx

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = self._indices()
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    items = list(pool.map(self.ds.__getitem__, sel))
                    xs = np.stack([np.asarray(x) for x, _ in items])
                    ys = np.asarray([y for _, y in items], np.int64)
                    q.put((xs, ys))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def device_prefetch(it, mesh=None, size: int = 2):
    """Overlap H2D transfer with compute: keep ``size`` batches in flight on
    device. With a mesh, batches are sharded along dim 0 (data parallel)."""
    import jax
    from slak_tpu.parallel import shard_batch

    def put(batch):
        if mesh is not None:
            return shard_batch(batch, mesh)
        return jax.tree_util.tree_map(jax.device_put, batch)

    buf = []
    for batch in it:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
