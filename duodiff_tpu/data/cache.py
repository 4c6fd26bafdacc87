"""One-time memmap cache of a decoded+transformed dataset.

The image datasets (CelebA, ImageNet) pay a JPEG decode + crop/resize per
item per epoch — on a 1-CPU host that is the training wall (NOTES.md: the
device step is ~118ms while the host feeds ~1 batch/287ms). Caching the
post-transform images as one (N, H, W, 3) .npy memmap (dtype = whatever the
base dataset yields: float32 for the tensor-mode-resized sets, uint8 for
raw ones) turns every later __getitem__ into a page-cache memcpy.

Sizes are modest for the fixed-size datasets (CelebA-64 float32: 9.5 GB,
ImageNet-64 float32: 26 GB); imagenet256 (106 GB) should only be cached on disks
that can take it — the cache is opt-in (--cache_data).

The build is atomic and concurrency-safe: each builder writes to a
private <key>.building.<pid>/ dir and renames it into place; a lost rename
race (another process finished first) discards the local build and uses the
winner's. Staleness: meta.json records the base dataset length, checked on
every open — a changed dataset triggers a rebuild (content/transform changes
beyond length are NOT detected; delete data/_duodiff_cache after editing
transforms).
"""

from __future__ import annotations

import json
import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


class MemmapCachedDataset:
    """Wraps any dataset with integer indexing returning (HWC array, label).

    Exposes the same contract plus the loader's scale/offset attributes.
    """

    def __init__(self, base, cache_dir, key: str, num_workers: int = 8,
                 verbose: bool = True):
        self.scale = getattr(base, "scale", 1.0 / 255.0)
        self.offset = getattr(base, "offset", 0.0)
        final = Path(cache_dir) / key
        if self._is_stale(final, base):
            self._build(base, cache_dir, key, num_workers, verbose)
        meta = json.loads((final / "meta.json").read_text())
        self.images = np.load(final / "images.npy", mmap_mode="r")
        assert list(self.images.shape) == meta["shape"], (
            f"corrupt cache at {final}: {self.images.shape} vs {meta['shape']}"
        )
        self.labels = np.load(final / "labels.npy")

    @staticmethod
    def _is_stale(final: Path, base) -> bool:
        if not (final / "meta.json").exists():
            return True
        meta = json.loads((final / "meta.json").read_text())
        n_base = len(base)
        if meta["shape"][0] != n_base:
            print(f"Dataset cache {final.name} is stale "
                  f"({meta['shape'][0]} cached vs {n_base} in the dataset); "
                  "rebuilding")
            return True
        return False

    @staticmethod
    def _build(base, cache_dir, key, num_workers, verbose):
        # pid-private build dir: concurrent builders (multi-process training
        # on a shared data_dir) never touch each other's work
        tmp = Path(cache_dir) / f"{key}.building.{os.getpid()}"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        n = len(base)
        img0, _ = base[0]
        shape = (n,) + tuple(img0.shape)
        if verbose:
            gb = float(np.prod(shape)) * img0.dtype.itemsize / 2**30
            print(f"Building dataset cache {key}: {n} images, {gb:.1f} GB "
                  f"(one-time)")
        images = np.lib.format.open_memmap(
            tmp / "images.npy", mode="w+", dtype=img0.dtype, shape=shape
        )
        labels = np.empty((n,), np.int32)

        def fill(i):
            img, label = base[i]
            images[i] = img
            labels[i] = label

        with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
            done = 0
            for _ in pool.map(fill, range(n), chunksize=256):
                done += 1
                if verbose and done % 50000 == 0:
                    print(f"  cached {done}/{n}")
        images.flush()
        del images
        np.save(tmp / "labels.npy", labels)
        (tmp / "meta.json").write_text(json.dumps({"shape": list(shape)}))
        final = Path(cache_dir) / key
        try:
            tmp.rename(final)
        except OSError:
            # lost the rename race (or a stale cache occupies the name):
            # prefer a same-length winner, else replace it
            meta = final / "meta.json"
            if meta.exists() and json.loads(meta.read_text())["shape"] == list(
                shape
            ):
                shutil.rmtree(tmp)
            else:
                shutil.rmtree(final)
                tmp.rename(final)

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i):
        return self.images[i], int(self.labels[i])
