"""Host input-pipeline throughput: thread vs process loader at N workers.

The reference feeds each GPU from a torch DataLoader with 10 worker
*processes* (``/root/reference/main.py:268-276``, ``timm1/data/loader.py:
189``); this probe measures our two modes (``slak_tpu/data/loader.py``)
on whatever host runs it.  Synthetic images (no disk IO) through the full
TrainTransform, so the number is pure decode+augment+assembly throughput.

Usage:  python tools/probe_loader.py [--size 224] [--bs 64] [--n 512]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def run(mode: str, workers: int, ds, bs: int) -> float:
    from slak_tpu.data.loader import BatchLoader
    dl = BatchLoader(ds, bs, shuffle=False, drop_last=True,
                     num_workers=workers, mode=mode)
    n = 0
    it = iter(dl)
    next(it)                       # absorb worker spawn/first-fill
    t0 = time.perf_counter()
    for x, y in it:
        n += x.shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    from slak_tpu.data.datasets import SyntheticDataset
    from slak_tpu.data.transforms import TrainTransform

    tf = TrainTransform(size=args.size)
    ds = SyntheticDataset(n=args.n, size=int(args.size * 1.15), transform=tf)
    for mode in ("thread", "process"):
        for w in args.workers:
            ips = run(mode, w, ds, args.bs)
            print(f"{mode:8s} workers={w:2d}: {ips:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
