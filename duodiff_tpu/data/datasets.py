"""Dataset readers: CIFAR-10, CelebA, ImageNet (reference datasets/*.py).

Self-contained numpy/PIL implementations (no torchvision). Each dataset is an
indexable returning (image NHWC float32, label int). Transforms match the
reference pipelines:

  - CIFAR-10: [0,1] -> Normalize(0.5, 0.5) (datasets/cifar10.py:22-27).
  - CelebA: Normalize -> CenterCrop(178) -> Resize(64) applied to the
    *tensor* (datasets/celeba.py:26-33), i.e. torchvision tensor-mode
    bilinear with antialias (the >=0.17 default). Reproduced exactly:
    crop on the decoded uint8 (lossless), then
    duodiff_tpu.data.resize.resize_bilinear (torch-interpolate-parity
    float math, no uint8 re-quantization). Normalize is affine and the
    resize is linear, so fusing scale/offset after the resize is exact.
  - ImageNet: ImageFolder over 256x256 images, optional tensor-mode
    Resize(64) with the same semantics (datasets/imagenet.py:29-44).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Optional

import numpy as np
from PIL import Image

from duodiff_tpu.data.loader import DataLoader
from duodiff_tpu.data.resize import resize_bilinear
from duodiff_tpu.data.sampler import ResumableSeedableSampler

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def _scale_offset(normalize: bool):
    """uint8 -> float transform constants: x/255 then (x-.5)/.5 when
    normalizing — fused into one multiply-add (the loader's native batch
    assembler or its numpy fallback applies them)."""
    return (2.0 / 255.0, -1.0) if normalize else (1.0 / 255.0, 0.0)


class Cifar10Dataset:
    """CIFAR-10 train split from the standard python pickle batches
    (``cifar-10-batches-py/data_batch_{1..5}``)."""

    def __init__(self, data_dir, normalize: bool = True, train: bool = True):
        root = Path(data_dir) / "cifar10" / "cifar-10-batches-py"
        if not root.exists():
            # also accept the batches dir directly
            alt = Path(data_dir) / "cifar-10-batches-py"
            if alt.exists():
                root = alt
            else:
                raise FileNotFoundError(f"CIFAR-10 not found under {data_dir}")
        files = (
            [root / f"data_batch_{i}" for i in range(1, 6)]
            if train
            else [root / "test_batch"]
        )
        datas, labels = [], []
        for f in files:
            with open(f, "rb") as fh:
                d = pickle.load(fh, encoding="bytes")
            datas.append(d[b"data"])
            labels.extend(d[b"labels"])
        raw = np.concatenate(datas, axis=0)  # (N, 3072) uint8, CHW order
        self.images = np.ascontiguousarray(
            raw.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        )  # NHWC uint8
        self.labels = np.asarray(labels, dtype=np.int32)
        self.scale, self.offset = _scale_offset(normalize)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return self.images[i], int(self.labels[i])


class CelebADataset:
    """CelebA aligned faces: CenterCrop(178) + tensor-mode antialiased
    bilinear Resize(64x64) (reference datasets/celeba.py:26-33,
    split='all'). Items are float32 HWC in 0..255 (the resize is float
    math, matching the reference's resize-after-ToTensor order); the
    loader's fused scale/offset maps them to the normalized range."""

    def __init__(self, data_dir, normalize: bool = True, size: int = 64):
        root = Path(data_dir) / "celeba" / "img_align_celeba"
        if not root.exists():
            raise FileNotFoundError(f"CelebA not found under {data_dir}")
        self.files = sorted(
            p for p in root.iterdir() if p.suffix.lower() in IMG_EXTENSIONS
        )
        if not self.files:
            raise FileNotFoundError(f"no images in {root}")
        self.scale, self.offset = _scale_offset(normalize)
        self.size = size

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i):
        img = Image.open(self.files[i]).convert("RGB")
        w, h = img.size
        # center crop to 178x178 (lossless on the decoded uint8)
        cw = ch = 178
        left, top = (w - cw) // 2, (h - ch) // 2
        img = img.crop((left, top, left + cw, top + ch))
        arr = np.asarray(img, dtype=np.float32)
        return resize_bilinear(arr, self.size, self.size, antialias=True), 0


class ImageFolderDataset:
    """ImageFolder-style tree: root/<class_name>/<image>. Labels are indices
    into the sorted class-name list (reference datasets/imagenet.py:44)."""

    def __init__(
        self,
        root,
        normalize: bool = True,
        resize_to: Optional[int] = None,
    ):
        root = Path(root)
        if not root.exists():
            raise FileNotFoundError(f"dataset not found at {root}")
        classes = sorted(p.name for p in root.iterdir() if p.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = []
        for c in classes:
            for p in sorted((root / c).iterdir()):
                if p.suffix.lower() in IMG_EXTENSIONS:
                    self.samples.append((p, self.class_to_idx[c]))
        if not self.samples:
            raise FileNotFoundError(f"no images under {root}")
        self.scale, self.offset = _scale_offset(normalize)
        self.resize_to = resize_to

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        path, label = self.samples[i]
        img = Image.open(path).convert("RGB")
        if self.resize_to is not None:
            # tensor-mode antialiased bilinear, float math (reference
            # resizes after ToTensor+Normalize: datasets/imagenet.py:30-39)
            arr = np.asarray(img, dtype=np.float32)
            return (
                resize_bilinear(arr, self.resize_to, self.resize_to,
                                antialias=True),
                label,
            )
        return np.asarray(img, dtype=np.uint8), label


def _maybe_cache(ds, cache_data: bool, data_dir, key: str,
                 num_workers: int):
    """Opt-in one-time memmap cache of the decoded+transformed images
    (duodiff_tpu/data/cache.py); no-op for datasets already in memory."""
    if not cache_data:
        return ds
    from duodiff_tpu.data.cache import MemmapCachedDataset

    return MemmapCachedDataset(
        ds, Path(data_dir) / "_duodiff_cache", key, num_workers=num_workers
    )


def get_cifar10_dataloader(
    batch_size, seed, data_dir, normalize: bool = True, num_workers: int = 4,
    cache_data: bool = False,
) -> DataLoader:
    # CIFAR-10 already lives in memory as uint8 — nothing to cache
    ds = Cifar10Dataset(data_dir, normalize=normalize)
    sampler = ResumableSeedableSampler(len(ds), seed=seed)
    return DataLoader(ds, batch_size, sampler, num_workers=num_workers)


def get_celeba_dataloader(
    batch_size, seed, data_dir="data/", normalize: bool = True,
    num_workers: int = 8, cache_data: bool = False,
) -> DataLoader:
    ds = CelebADataset(data_dir, normalize=normalize)
    # "aa" key suffix: tensor-mode antialiased float resize (cache contents
    # changed vs the earlier uint8 PIL pipeline; length-only staleness check)
    ds = _maybe_cache(ds, cache_data, data_dir,
                      f"celeba64aa_norm{int(normalize)}", num_workers)
    sampler = ResumableSeedableSampler(len(ds), seed=seed)
    return DataLoader(ds, batch_size, sampler, num_workers=num_workers)


def get_imagenet_dataloader(
    batch_size,
    seed,
    data_dir,
    resize: bool,
    normalize: bool = True,
    num_workers: int = 16,
    cache_data: bool = False,
) -> DataLoader:
    ds = ImageFolderDataset(
        Path(data_dir) / "imagenet",
        normalize=normalize,
        resize_to=64 if resize else None,
    )
    ds = _maybe_cache(
        ds, cache_data, data_dir,
        f"imagenet{'64aa' if resize else '256'}_norm{int(normalize)}",
        num_workers,
    )
    sampler = ResumableSeedableSampler(len(ds), seed=seed)
    return DataLoader(ds, batch_size, sampler, num_workers=num_workers)


def get_dataloader(dataset: str, batch_size, seed, data_dir, **kw) -> DataLoader:
    """Dispatch by dataset name (reference trainer.py:132-160)."""
    if dataset == "cifar10":
        return get_cifar10_dataloader(batch_size, seed, data_dir, **kw)
    elif dataset == "celeba":
        return get_celeba_dataloader(batch_size, seed, data_dir, **kw)
    elif dataset == "imagenet64":
        return get_imagenet_dataloader(batch_size, seed, data_dir, resize=True, **kw)
    elif dataset == "imagenet256":
        return get_imagenet_dataloader(batch_size, seed, data_dir, resize=False, **kw)
    raise ValueError(f"Dataset {dataset} not implemented.")
