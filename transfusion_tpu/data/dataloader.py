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


class PackingLoader:
    """Pipelined loader: encodes + packs upcoming batches on a background
    thread so host packing overlaps device compute (the async input pipeline
    the reference lacks — its collate/assembly runs inline every step).

    Yields PackedBatch objects ready for `Trainer.train_step` /
    `Transfusion.loss(packed=...)`.
    """

    def __init__(self, model, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, prefetch: int = 2, **pack_kw):
        import queue
        import threading

        self.model = model
        self.loader = DataLoader(dataset, batch_size, shuffle=shuffle, seed=seed)
        pack_kw.setdefault("shift_friendly", True)
        self.pack_kw = pack_kw
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            for batch in self.loader:
                if self._stop.is_set():
                    return
                batch = self.model.encode_modalities(batch)
                self._q.put(self.model.pack(batch, **self.pack_kw))

    def __iter__(self):
        return self

    def __next__(self):
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
