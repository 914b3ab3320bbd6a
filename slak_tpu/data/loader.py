"""Prefetching batch loader — the host side of the input pipeline, replacing
torch's ``DataLoader`` + timm ``PrefetchLoader`` (``timm1/data/loader.py:
76,189``; reference builds them at ``main.py:247-287``).

Design (TPU-first):
  * two worker modes (``mode=``):
      - ``"thread"`` — a thread pool decodes + transforms samples (PIL/
        numpy release the GIL for the heavy ops); zero setup cost, but
        batch assembly is GIL-bound Python, so it tops out near one core;
      - ``"process"`` — torch-DataLoader-style worker *processes*
        (``main.py:268-276`` builds DataLoader(num_workers=10);
        ``timm1/data/loader.py:189``): ``spawn`` children each assemble
        whole batches directly into shared-memory slots (no pickling of
        image tensors through pipes — the analog of torch's shared-memory
        tensor transport), the parent reorders results and yields batches
        in index order.  Workers are recreated per epoch (torch's
        ``persistent_workers=False`` default) and reseeded from
        (seed, epoch, worker_id) so augmentation streams differ across
        workers and epochs.
  * a small prefetch queue keeps batches ready so the device never waits —
    device placement (and the H2D copy) happens in
    :func:`device_prefetch`, overlapping the next batch's transfer with the
    current step's compute (the reference's CUDA-stream prefetch analog);
  * per-epoch shuffling with a seeded RNG and DistributedSampler-style
    shard-by-rank slicing (``main.py:247-259``): every host sees an equal
    number of batches, padding by wrap-around like torch's sampler.

Measured on this box (1 CPU core, ``os.sched_getaffinity`` = {0}) —
synthetic 224x224, full TrainTransform (native rrc+normalize path), bs64,
``tools/probe_loader.py`` (2026-08-18):
    thread : 1w 193 | 2w 270 | 4w 310 img/s
    process: 1w 174 | 2w 131 | 4w 159 img/s
On one core the thread mode wins (the native/PIL sections release the GIL
and pipeline with Python bookkeeping at zero IPC cost) and extra
*processes* only add context-switch + spawn overhead — so ``thread``
stays the default.  The process mode is for multi-core hosts feeding a
fast chip (a 1983 img/s eval chip needs ~8 cores at the measured ~220
img/s/core): independent children, shared-memory transport, ordered
reassembly — the same design torch's DataLoader scales with, minus the
per-batch pickling.

Failure policy (fail fast, never respawn): a worker that raises reports
the traceback and the parent re-raises immediately; a worker that dies
HARD (segfault/OOM-kill — no message) is caught by the parent's 5 s
result-poll liveness check, which also covers its lost in-flight task
(the task queue is shared, but a dispatched task rides with the worker).
Both paths raise within one poll window — torch DataLoader's
``_MultiProcessingDataLoaderIter`` watchdog semantics. Recovery is the
auto-resume layer's job (train/main.py restarts from the last
checkpoint), not the loader's; silently respawning a worker would skip
its batch and bias the epoch. Covered by tests/test_data.py::
test_process_loader_{propagates_worker_errors,detects_hard_worker_death}.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Tuple

import numpy as np


def _worker_loop(ds, img_shm_name, lbl_shm_name, n_slots, slot_shape,
                 task_q, result_q, worker_seed):
    """Process-mode worker body (runs in a ``spawn`` child; touches only
    numpy/PIL — never JAX).  Assembles whole batches into its assigned
    shared-memory slot, like a torch DataLoader worker with batch_size set
    (``torch/utils/data/_utils/worker.py`` semantics: whole-batch tasks,
    per-worker seeding)."""
    import random as _random
    from multiprocessing import shared_memory

    _random.seed(worker_seed)
    np.random.seed(worker_seed % (2 ** 32))
    img_shm = shared_memory.SharedMemory(name=img_shm_name)
    lbl_shm = shared_memory.SharedMemory(name=lbl_shm_name)
    bs = slot_shape[0]
    imgs = np.ndarray((n_slots,) + slot_shape, np.float32,
                      buffer=img_shm.buf)
    lbls = np.ndarray((n_slots, bs), np.int64, buffer=lbl_shm.buf)
    try:
        while True:
            task = task_q.get()
            if task is None:
                return
            b, slot, sel = task
            try:
                for i, j in enumerate(sel):
                    x, y = ds[int(j)]
                    imgs[slot, i] = np.asarray(x, np.float32)
                    lbls[slot, i] = y
                result_q.put(("ok", b, slot, len(sel)))
            except BaseException:
                import traceback
                result_q.put(("err", b, traceback.format_exc()))
                return
    finally:
        img_shm.close()
        lbl_shm.close()


class BatchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 8, seed: int = 0,
                 rank: int = 0, world_size: int = 1,
                 prefetch_batches: int = 4, mode: str = "thread"):
        if mode not in ("thread", "process"):
            raise ValueError(f"unknown loader mode {mode!r}")
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.prefetch = prefetch_batches
        self.mode = mode
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
        if self.mode == "process":
            return self._iter_process()
        return self._iter_thread()

    def _iter_thread(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
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

    def _iter_process(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Multi-process iteration: N spawned workers fill shared-memory
        batch slots; the parent dispatches batch tasks, reorders completed
        results, and yields copies in index order.  ``spawn`` (never fork)
        because the parent holds live JAX/TPU-runtime threads."""
        from multiprocessing import shared_memory

        idx = self._indices()
        nb = len(self)
        if nb == 0:
            return
        # probe one transformed sample in the parent for the slot shape
        sample = np.asarray(self.ds[int(idx[0])][0], np.float32)
        bs = self.batch_size
        slot_shape = (bs,) + sample.shape
        n_workers = min(self.num_workers, nb)
        n_slots = min(nb, self.prefetch + n_workers)

        ctx = mp.get_context("spawn")
        img_shm = shared_memory.SharedMemory(
            create=True, size=int(np.prod((n_slots,) + slot_shape)) * 4)
        lbl_shm = shared_memory.SharedMemory(create=True,
                                             size=n_slots * bs * 8)
        imgs = np.ndarray((n_slots,) + slot_shape, np.float32,
                          buffer=img_shm.buf)
        lbls = np.ndarray((n_slots, bs), np.int64, buffer=lbl_shm.buf)
        task_q = ctx.Queue()
        result_q = ctx.Queue()
        procs = []
        try:
            for w in range(n_workers):
                p = ctx.Process(
                    target=_worker_loop,
                    args=(self.ds, img_shm.name, lbl_shm.name, n_slots,
                          slot_shape, task_q, result_q,
                          (self.seed + self.epoch) * 9973 + w),
                    daemon=True)
                p.start()
                procs.append(p)

            next_dispatch = 0

            def dispatch(slot):
                nonlocal next_dispatch
                b = next_dispatch
                sel = idx[b * bs:(b + 1) * bs]
                task_q.put((b, slot, sel.tolist()))
                next_dispatch += 1

            for slot in range(n_slots):
                if next_dispatch >= nb:
                    break
                dispatch(slot)

            done = {}                      # batch_idx -> (slot, n)
            for b in range(nb):
                while b not in done:
                    try:
                        msg = result_q.get(timeout=5.0)
                    except queue.Empty:
                        # no worker exits mid-epoch unless it crashed hard
                        if any(not p.is_alive() for p in procs):
                            raise RuntimeError(
                                "a loader worker died unexpectedly")
                        continue
                    if msg[0] == "err":
                        raise RuntimeError(
                            f"loader worker failed on batch {msg[1]}:\n"
                            f"{msg[2]}")
                    done[msg[1]] = (msg[2], msg[3])
                slot, n = done.pop(b)
                # copy out so the slot can be refilled while the consumer
                # still holds the previous batch (device_put is async)
                yield imgs[slot, :n].copy(), lbls[slot, :n].copy()
                if next_dispatch < nb:
                    dispatch(slot)
        finally:
            for _ in procs:
                task_q.put(None)
            for p in procs:
                p.join(timeout=5)
                if p.is_alive():
                    p.terminate()
            task_q.close()
            result_q.close()
            img_shm.close()
            lbl_shm.close()
            img_shm.unlink()
            lbl_shm.unlink()


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
