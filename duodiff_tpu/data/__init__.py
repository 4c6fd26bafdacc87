from duodiff_tpu.data.sampler import ResumableSeedableSampler
from duodiff_tpu.data.loader import DataLoader
from duodiff_tpu.data.datasets import (
    CelebADataset,
    Cifar10Dataset,
    ImageFolderDataset,
    get_celeba_dataloader,
    get_cifar10_dataloader,
    get_imagenet_dataloader,
    get_dataloader,
)

__all__ = [
    "ResumableSeedableSampler",
    "DataLoader",
    "Cifar10Dataset",
    "CelebADataset",
    "ImageFolderDataset",
    "get_cifar10_dataloader",
    "get_celeba_dataloader",
    "get_imagenet_dataloader",
    "get_dataloader",
]
