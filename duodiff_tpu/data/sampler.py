"""Resumable, seedable index sampler.

Same contract as the reference's ResumableSeedableSampler
(datasets/sampler.py:6-60): an infinite stream of dataset indices, one
permutation per epoch seeded with ``seed + epoch``, with get_state/set_state
for exact mid-epoch resume. Implemented on numpy (no torch dependency) with
the state as plain arrays so it round-trips through Orbax checkpoints.
"""

from __future__ import annotations

import numpy as np


class ResumableSeedableSampler:
    def __init__(self, num_samples: int, shuffle: bool = True, seed: int | None = None):
        self.num_samples = num_samples
        self.shuffle = shuffle
        self.seed = int(seed) if seed is not None else int(
            np.random.randint(2**31)
        )
        self.epoch = 0
        self.perm_index = 0
        self.perm = self._make_perm()

    def _make_perm(self) -> np.ndarray:
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            return rng.permutation(self.num_samples)
        return np.arange(self.num_samples)

    def __iter__(self):
        while True:
            while self.perm_index < len(self.perm):
                self.perm_index += 1
                yield int(self.perm[self.perm_index - 1])
            self.perm_index = 0
            self.epoch += 1
            self.perm = self._make_perm()

    def next_indices(self, n: int) -> np.ndarray:
        """Draw the next n indices (rolls epochs as needed)."""
        out = np.empty(n, dtype=np.int64)
        filled = 0
        while filled < n:
            avail = len(self.perm) - self.perm_index
            take = min(avail, n - filled)
            out[filled : filled + take] = self.perm[
                self.perm_index : self.perm_index + take
            ]
            self.perm_index += take
            filled += take
            if self.perm_index >= len(self.perm):
                self.perm_index = 0
                self.epoch += 1
                self.perm = self._make_perm()
        return out

    def __len__(self) -> int:
        return self.num_samples

    def get_state(self) -> dict:
        return {
            "perm": np.asarray(self.perm),
            "perm_index": self.perm_index,
            "epoch": self.epoch,
            "seed": self.seed,
        }

    def set_state(self, state: dict) -> None:
        self.perm = np.asarray(state["perm"])
        self.perm_index = int(state["perm_index"])
        self.epoch = int(state["epoch"])
        self.seed = int(state["seed"])
