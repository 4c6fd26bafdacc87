"""Data-layer tests on synthetic datasets (the reference skips data tests
when data/ is absent, tests/test_datasets.py:14-22; we synthesize instead)."""

import pickle

import numpy as np
import pytest
from PIL import Image

from duodiff_tpu.data import (
    DataLoader,
    ResumableSeedableSampler,
    get_cifar10_dataloader,
    get_celeba_dataloader,
    get_imagenet_dataloader,
)


# ---------------- sampler ----------------

def test_sampler_is_seeded_permutation():
    s1 = ResumableSeedableSampler(10, seed=3)
    s2 = ResumableSeedableSampler(10, seed=3)
    a = s1.next_indices(10)
    b = s2.next_indices(10)
    np.testing.assert_array_equal(a, b)
    assert sorted(a.tolist()) == list(range(10))


def test_sampler_rolls_epochs_with_new_perm():
    s = ResumableSeedableSampler(5, seed=0)
    first = s.next_indices(5)
    second = s.next_indices(5)
    assert sorted(first.tolist()) == sorted(second.tolist()) == list(range(5))
    assert s.epoch == 2  # hmm: after exactly 2*5 draws both epochs rolled


def test_sampler_resume_mid_epoch():
    s = ResumableSeedableSampler(100, seed=1)
    s.next_indices(37)
    state = s.get_state()
    rest_a = s.next_indices(63)

    s2 = ResumableSeedableSampler(100, seed=999)  # different seed; state overrides
    s2.set_state(state)
    rest_b = s2.next_indices(63)
    np.testing.assert_array_equal(rest_a, rest_b)


def test_sampler_iter_protocol():
    s = ResumableSeedableSampler(4, seed=0)
    it = iter(s)
    vals = [next(it) for _ in range(9)]  # crosses 2 epoch boundaries
    assert all(0 <= v < 4 for v in vals)


# ---------------- synthetic datasets ----------------

@pytest.fixture
def cifar_dir(tmp_path):
    root = tmp_path / "cifar10" / "cifar-10-batches-py"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        data = rng.randint(0, 256, (20, 3072), dtype=np.uint8)
        labels = rng.randint(0, 10, (20,)).tolist()
        with open(root / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
    return tmp_path


@pytest.fixture
def celeba_dir(tmp_path):
    root = tmp_path / "celeba" / "img_align_celeba"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = rng.randint(0, 256, (218, 178, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"{i:06d}.jpg")
    return tmp_path


@pytest.fixture
def imagenet_dir(tmp_path):
    root = tmp_path / "imagenet"
    rng = np.random.RandomState(0)
    for cls in ["n01", "n02"]:
        (root / cls).mkdir(parents=True)
        for i in range(4):
            arr = rng.randint(0, 256, (256, 256, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / cls / f"{i}.png")
    return tmp_path


def test_cifar10_loader(cifar_dir):
    dl = get_cifar10_dataloader(8, seed=0, data_dir=cifar_dir, num_workers=2)
    batch = dl.next_batch()
    assert batch["image"].shape == (8, 32, 32, 3)
    assert batch["label"].shape == (8,)
    # fused u8 * (2/255) - 1 differs from exact division by <= 2e-7 at x=255
    eps = 1e-6
    assert batch["image"].min() >= -1.0 - eps and batch["image"].max() <= 1.0 + eps
    # normalize=False keeps [0, 1]
    dl2 = get_cifar10_dataloader(8, seed=0, data_dir=cifar_dir, normalize=False)
    b2 = dl2.next_batch()
    assert b2["image"].min() >= 0.0 and b2["image"].max() <= 1.0 + eps


def test_celeba_loader_crop_resize(celeba_dir):
    dl = get_celeba_dataloader(4, seed=0, data_dir=celeba_dir, num_workers=2)
    batch = dl.next_batch()
    assert batch["image"].shape == (4, 64, 64, 3)


def test_imagenet_loader_both_sizes(imagenet_dir):
    dl64 = get_imagenet_dataloader(4, seed=0, data_dir=imagenet_dir, resize=True)
    assert dl64.next_batch()["image"].shape == (4, 64, 64, 3)
    dl256 = get_imagenet_dataloader(4, seed=0, data_dir=imagenet_dir, resize=False)
    b = dl256.next_batch()
    assert b["image"].shape == (4, 256, 256, 3)
    assert set(np.unique(b["label"])) <= {0, 1}


def test_loader_deterministic_given_seed(cifar_dir):
    a = get_cifar10_dataloader(8, seed=7, data_dir=cifar_dir).next_batch()
    b = get_cifar10_dataloader(8, seed=7, data_dir=cifar_dir).next_batch()
    np.testing.assert_array_equal(a["image"], b["image"])


def test_loader_state_roundtrip(cifar_dir):
    dl = get_cifar10_dataloader(8, seed=0, data_dir=cifar_dir)
    dl.next_batch()
    state = dl.get_state()
    want = dl.next_batch()

    dl2 = get_cifar10_dataloader(8, seed=123, data_dir=cifar_dir)
    dl2.set_state(state)
    got = dl2.next_batch()
    np.testing.assert_array_equal(want["image"], got["image"])


def test_loader_prefetch_iterator(cifar_dir):
    dl = get_cifar10_dataloader(8, seed=0, data_dir=cifar_dir)
    it = iter(dl)
    batches = [next(it) for _ in range(3)]
    assert all(b["image"].shape == (8, 32, 32, 3) for b in batches)


def test_native_assembler_matches_numpy():
    """The C++ fused batch assembler must bit-match the numpy path."""
    from duodiff_tpu.data._native import get_assembler

    assembler = get_assembler()
    if assembler is None:
        pytest.skip("no C++ toolchain available")
    rng = np.random.RandomState(0)
    imgs = [np.ascontiguousarray(rng.randint(0, 256, (16, 16, 3), np.uint8))
            for _ in range(5)]
    out = np.empty((5, 16, 16, 3), np.float32)
    assembler(imgs, 2.0 / 255.0, -1.0, out, n_threads=3)
    want = np.stack(imgs).astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_prefetching_iterator_state_is_checkpoint_exact(cifar_dir):
    """get_state() must reflect the last CONSUMED batch even while the
    producer runs ahead, so resume replays exactly the unseen batches."""
    import time

    dl = get_cifar10_dataloader(8, seed=0, data_dir=cifar_dir, num_workers=2)
    it = dl.prefetching_iterator()
    consumed = [next(it), next(it)]
    time.sleep(0.3)  # let the producer run ahead
    state = dl.get_state()

    dl2 = get_cifar10_dataloader(8, seed=55, data_dir=cifar_dir)
    dl2.set_state(state)
    resumed = dl2.next_batch()
    want = next(it)  # the 3rd consumed batch of the original stream
    np.testing.assert_array_equal(resumed["image"], want["image"])


def test_memmap_cache_identity_and_reuse(tmp_path):
    """The memmap cache must reproduce the base dataset exactly, survive
    reopening without the base, and plug into the dataloader factory."""
    from duodiff_tpu.data.cache import MemmapCachedDataset

    root = tmp_path / "imagenet"
    rng = np.random.RandomState(0)
    for cls in ("cat", "dog"):
        (root / cls).mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
            ).save(root / cls / f"{i}.png")

    from duodiff_tpu.data import ImageFolderDataset

    base = ImageFolderDataset(root, normalize=True, resize_to=8)
    cached = MemmapCachedDataset(base, tmp_path / "cache", "tiny",
                                 num_workers=2, verbose=False)
    assert len(cached) == len(base) == 6
    for i in range(6):
        bi, bl = base[i]
        ci, cl = cached[i]
        np.testing.assert_array_equal(np.asarray(ci), bi)
        assert cl == bl
    assert cached.scale == base.scale and cached.offset == base.offset

    # reopen from disk — same length passes the staleness check and must NOT
    # rebuild (decoding through Boom would raise)
    class Boom:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            raise AssertionError("cache rebuild attempted")

    cached2 = MemmapCachedDataset(Boom(), tmp_path / "cache", "tiny",
                                  verbose=False)
    np.testing.assert_array_equal(np.asarray(cached2[3][0]),
                                  np.asarray(cached[3][0]))

    # a changed dataset length is detected as stale and rebuilt
    base2 = ImageFolderDataset(root, normalize=True, resize_to=8)
    base2.samples = base2.samples[:4]
    rebuilt = MemmapCachedDataset(base2, tmp_path / "cache", "tiny",
                                  verbose=False)
    assert len(rebuilt) == 4


# ---------------- tensor-mode resize parity (reference dataset semantics) --


@pytest.mark.parametrize("antialias", [True, False])
@pytest.mark.parametrize(
    "geom", [(178, 178, 64, 64), (256, 256, 64, 64), (218, 178, 64, 64),
             (32, 32, 299, 299)]
)
def test_resize_matches_torch_interpolate(geom, antialias):
    """resize_bilinear must reproduce torch F.interpolate exactly — the
    reference resizes the normalized TENSOR (datasets/celeba.py:26-33), so
    torchvision tensor-mode semantics (= F.interpolate bilinear,
    align_corners=False) are the parity target."""
    import torch
    import torch.nn.functional as F

    from duodiff_tpu.data.resize import resize_bilinear

    h, w, oh, ow = geom
    x = np.random.RandomState(0).standard_normal((h, w, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(2, 0, 1)[None]
    want = (
        F.interpolate(xt, size=(oh, ow), mode="bilinear",
                      align_corners=False, antialias=antialias)[0]
        .permute(1, 2, 0).numpy()
    )
    got = resize_bilinear(x, oh, ow, antialias=antialias)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_celeba_pipeline_matches_reference_transform(celeba_dir):
    """End-to-end: our CelebA batch must match the reference's exact
    transform chain ToTensor -> Normalize(.5,.5) -> CenterCrop(178) ->
    tensor-mode Resize(64, antialias) (datasets/celeba.py:26-33) computed
    with torch on the same files."""
    import torch
    import torch.nn.functional as F

    dl = get_celeba_dataloader(4, seed=0, data_dir=celeba_dir, num_workers=2)
    batch = dl.next_batch()

    files = sorted((celeba_dir / "celeba" / "img_align_celeba").iterdir())
    idx = ResumableSeedableSampler(len(files), seed=0).next_indices(4)
    want = []
    for i in idx:
        arr = np.asarray(Image.open(files[i]).convert("RGB"), np.float32)
        t = torch.from_numpy(arr / 255.0).permute(2, 0, 1)[None]
        t = (t - 0.5) / 0.5
        h, w = t.shape[-2:]
        top, left = (h - 178) // 2, (w - 178) // 2
        t = t[..., top:top + 178, left:left + 178]
        t = F.interpolate(t, size=(64, 64), mode="bilinear",
                          align_corners=False, antialias=True)
        want.append(t[0].permute(1, 2, 0).numpy())
    np.testing.assert_allclose(batch["image"], np.stack(want), atol=1e-5)


def test_dataloader_factory_with_cache(tmp_path):
    """get_dataloader(..., cache_data=True) serves batches from the cache."""
    from duodiff_tpu.data import get_dataloader

    root = tmp_path / "imagenet"
    rng = np.random.RandomState(0)
    for cls in ("a", "b"):
        (root / cls).mkdir(parents=True)
        for i in range(4):
            Image.fromarray(
                rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
            ).save(root / cls / f"{i}.png")

    dl = get_dataloader("imagenet64", 4, seed=0, data_dir=tmp_path,
                        cache_data=True)
    batch = dl.next_batch()
    assert batch["image"].shape == (4, 64, 64, 3)
    assert (tmp_path / "_duodiff_cache" / "imagenet64aa_norm1" /
            "meta.json").exists()
    dl2 = get_dataloader("imagenet64", 4, seed=0, data_dir=tmp_path,
                         cache_data=True)
    np.testing.assert_array_equal(dl2.next_batch()["image"], batch["image"])
