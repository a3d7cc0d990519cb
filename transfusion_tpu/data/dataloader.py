"""Minimal dataloader for ragged multimodal samples.

Equivalent of the reference's `create_dataloader` (transfusion.py:323-328):
identity list-of-lists collation — no padding at collate time, raggedness is
resolved by the packer. Pure-python iteration (no torch dependency).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset: Sequence,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[list]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield [list(self.dataset[int(i)]) for i in chunk]


def create_dataloader(dataset, batch_size: int = 1, shuffle: bool = False, **kw):
    return DataLoader(dataset, batch_size=batch_size, shuffle=shuffle, **kw)


def cycle(loader):
    while True:
        yield from loader
