"""Multi-host input sharding.

In multi-host SPMD each process feeds only its local devices' shard of the
global batch (data rides DCN only at the filesystem level, never between
accelerators).  ``HostShardedDataset`` wraps any indexable dataset and
exposes this process's slice; combined with PrefetchLoader it is the
per-host input pipeline (SURVEY.md §2.2's DP plan).
"""

from __future__ import annotations

from typing import Optional

import jax


class HostShardedDataset:
    """View of ``dataset`` containing every process_count-th item, offset by
    this process's index (deterministic, disjoint, near-equal shards)."""

    def __init__(self, dataset, process_index: Optional[int] = None, process_count: Optional[int] = None):
        self.dataset = dataset
        self.pi = jax.process_index() if process_index is None else process_index
        self.pc = jax.process_count() if process_count is None else process_count

    def __len__(self) -> int:
        n = len(self.dataset)
        return (n - self.pi + self.pc - 1) // self.pc

    def __getitem__(self, i: int):
        return self.dataset[self.pi + i * self.pc]

    def initialize(self):
        if hasattr(self.dataset, "initialize"):
            self.dataset.initialize()

    @property
    def img_size(self):
        return getattr(self.dataset, "img_size", None)
