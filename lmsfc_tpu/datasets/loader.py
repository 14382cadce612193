"""Host-side data loader: list-of-samples batches, identity collation.

Mirrors the reference's loader semantics (config/config.py:97-117: torch
DataLoader + InferenceSampler + bypass_collator returning the sample list) —
on TPU the input pipeline stays host-side Python; device transfer happens in
the vision wrapper where shapes are known.
"""

from __future__ import annotations

from typing import Any, Iterator, List


class DataLoader:
    def __init__(self, dataset: Any, batch_size: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size

    def __len__(self) -> int:
        return -(-len(self.dataset) // self.batch_size)

    def __iter__(self) -> Iterator[List[Any]]:
        batch: List[Any] = []
        for i in range(len(self.dataset)):
            batch.append(self.dataset[i])
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch:
            yield batch
