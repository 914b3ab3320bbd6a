"""Dataset builders — the equivalent of the reference's ``build_dataset``
(``datasets.py:16-47``): ``IMNET`` (ImageFolder train/val), ``CIFAR`` (100),
``image_folder`` (generic), plus a synthetic dataset for benchmarking that
the torch reference lacks.

Datasets return raw PIL-decodable items; all augmentation lives in
:mod:`slak_tpu.data.transforms` (host) and the device-side mixup / erasing.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, List, Optional, Tuple

import numpy as np
from PIL import Image

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm")


class ImageFolderDataset:
    """torchvision ImageFolder semantics: class-per-subdir, sorted classes."""

    def __init__(self, root: str, transform: Optional[Callable] = None):
        self.root = root
        self.transform = transform
        classes = sorted(d for d in os.listdir(root)
                         if os.path.isdir(os.path.join(root, d)))
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, fname),
                                         self.class_to_idx[c]))
        self.nb_classes = len(classes)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, label = self.samples[idx]
        img = Image.open(path)
        if self.transform is not None:
            img = self.transform(img)
        return img, label


class CIFAR100Dataset:
    """Reads the standard ``cifar-100-python`` pickle layout from disk
    (no download; the reference uses torchvision's downloader)."""

    def __init__(self, root: str, train: bool,
                 transform: Optional[Callable] = None):
        split = "train" if train else "test"
        path = os.path.join(root, "cifar-100-python", split)
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="latin1")
        self.data = d["data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.labels = d["fine_labels"]
        self.transform = transform
        self.nb_classes = 100

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, idx: int):
        img = Image.fromarray(self.data[idx])
        if self.transform is not None:
            img = self.transform(img)
        return img, self.labels[idx]


class SyntheticDataset:
    """Deterministic fake images for benchmarks/smoke tests (no disk IO)."""

    def __init__(self, n: int = 1024, size: int = 224, nb_classes: int = 1000,
                 transform: Optional[Callable] = None, seed: int = 0):
        self.n, self.size, self.nb_classes = n, size, nb_classes
        self.transform = transform
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed + idx)
        arr = rng.integers(0, 256, (self.size, self.size, 3), np.uint8)
        img = Image.fromarray(arr)
        if self.transform is not None:
            img = self.transform(img)
        return img, int(rng.integers(0, self.nb_classes))


def build_dataset(is_train: bool, data_set: str, data_path: str,
                  transform: Optional[Callable] = None,
                  eval_data_path: Optional[str] = None,
                  nb_classes: Optional[int] = None,
                  synthetic_len: int = 1024, synthetic_size: int = 224):
    """Mirror of reference ``build_dataset`` (datasets.py:16-47).

    Returns (dataset, nb_classes)."""
    if data_set == "CIFAR":
        ds = CIFAR100Dataset(data_path, is_train, transform)
        return ds, 100
    if data_set == "IMNET":
        root = os.path.join(data_path, "train" if is_train else "val")
        ds = ImageFolderDataset(root, transform)
        return ds, 1000
    if data_set == "image_folder":
        root = data_path if is_train else (eval_data_path or data_path)
        ds = ImageFolderDataset(root, transform)
        return ds, nb_classes if nb_classes is not None else ds.nb_classes
    if data_set == "synthetic":
        ds = SyntheticDataset(n=synthetic_len, size=synthetic_size,
                              transform=transform,
                              nb_classes=nb_classes or 1000)
        return ds, ds.nb_classes
    raise NotImplementedError(data_set)
