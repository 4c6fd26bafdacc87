"""Run-naming and logging helpers (reference utils/train_utils.py:15-19,
trainer.py:174-245)."""

from __future__ import annotations

import json
from pathlib import Path
from time import localtime, strftime


def get_exp_name(args) -> str:
    """``{dataset}-{model}-{timestamp}`` (reference utils/train_utils.py:15-19)."""
    timestamp = strftime("%Y-%m-%d_%H:%M:%S", localtime())
    return f"{args.dataset}-{args.model}-{timestamp}"


class MetricsLogger:
    """Scalar/image logging: TensorBoard events (via torch's SummaryWriter,
    lazily imported) plus an always-on metrics.jsonl for tooling that
    doesn't read TB."""

    def __init__(self, log_dir, use_tensorboard: bool = True,
                 enabled: bool = True):
        """``enabled=False`` (multi-host non-lead processes) makes every
        method a no-op: all processes share one log dir on a common
        filesystem, only process 0 writes metrics files."""
        self.enabled = enabled
        self.log_dir = Path(log_dir)
        self._jsonl = None
        self._tb = None
        if not enabled:
            return
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.log_dir))
            except Exception as e:  # tensorboard optional
                print(f"TensorBoard writer unavailable ({e}); jsonl only")

    def log_scalars(self, step: int, scalars: dict) -> None:
        if not self.enabled:
            return
        rec = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def log_image(self, step: int, tag: str, image_hwc) -> None:
        """image_hwc: (H, W, C) float in [0, 1]."""
        if self._tb is not None:
            import numpy as np

            self._tb.add_image(
                tag, np.transpose(np.asarray(image_hwc), (2, 0, 1)), step
            )

    def log_hparams(self, hparams: dict) -> None:
        if not self.enabled:
            return
        with open(self.log_dir / "hparams.json", "w") as f:
            json.dump({k: _maybe_str(v) for k, v in hparams.items()}, f, indent=2)
        if self._tb is not None:
            # TB hparams table (reference trainer.py:69-75 writes both)
            simple = {
                k: v if isinstance(v, (int, float, bool, str)) else str(v)
                for k, v in hparams.items()
                if v is not None
            }
            try:
                self._tb.add_hparams(simple, {"hparams/recorded": 1.0})
            except Exception as e:
                print(f"add_hparams skipped ({e})")

    def close(self) -> None:
        """Flush and release the jsonl fd and the TB event-writer threads.
        Idempotent; the logger becomes a no-op afterwards (``enabled``
        flips off) so late calls from embedding code can't crash."""
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
        self.enabled = False


def _maybe_str(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


def seed_everything(seed: int):
    """Seed the host-side RNGs (python, numpy) and return a jax PRNG key.

    The reference reseeds four global RNGs (utils/train_utils.py:8-12,
    re-applied every step at trainer.py:262). In this framework device
    randomness flows through explicit jax.random keys instead — this helper
    covers host-side randomness (e.g. ad-hoc numpy use) and hands back the
    root key for the explicit stream.
    """
    import random

    import jax
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
