"""Dataset factory + host-sharded batching loader.

Replaces the reference's torch DataLoader + DistributedSampler
(reference datasets/__init__.py:11-31): samples are sharded across hosts
by ``jax.process_index()`` (SURVEY.md §2.8's TPU-native replacement for
DistributedSampler), shuffled per epoch from a seeded permutation
(``set_epoch`` semantics), stacked into numpy batches, and prefetched on
a background thread so host IO overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import numpy as np


def get_dataset(name: str, datapath: str, scans: list[str], nviews: int,
                mode: str, **kwargs):
    """By-name factory mirroring the reference's dataset_name choices
    (reference main.py:19)."""
    if name == "dtu_yao":
        from dmvsnet_tpu.data.dtu import DTUTrainDataset

        return DTUTrainDataset(datapath, scans, nviews=nviews, mode=mode, **kwargs)
    if name == "blendedmvs":
        from dmvsnet_tpu.data.blendedmvs import BlendedMVSDataset

        return BlendedMVSDataset(datapath, scans, nviews=nviews, mode=mode, **kwargs)
    if name == "general_eval":
        from dmvsnet_tpu.data.general_eval import GeneralEvalDataset

        return GeneralEvalDataset(datapath, scans, nviews=nviews, **kwargs)
    raise ValueError(f"unknown dataset {name!r}")


def _stack(samples: list[dict]) -> dict:
    def stack_key(vals):
        if isinstance(vals[0], dict):
            return {k: stack_key([v[k] for v in vals]) for k in vals[0]}
        if isinstance(vals[0], str):
            return list(vals)
        return np.stack(vals)

    return {k: stack_key([s[k] for s in samples]) for k in samples[0]}


class Loader:
    """Epoch-aware, host-sharded, background-prefetching batch iterator."""

    def __init__(
        self, dataset, batch_size: int, shuffle: bool, seed: int = 0,
        drop_last: bool = True, num_hosts: int | None = None,
        host_id: int | None = None, prefetch: int = 2, workers: int = 4,
    ):
        import jax

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_hosts = num_hosts if num_hosts is not None else jax.process_count()
        self.host_id = host_id if host_id is not None else jax.process_index()
        self.prefetch = prefetch
        # sample-decode thread pool (the reference's DataLoader
        # num_workers): PIL/cv2/numpy release the GIL during decode, so
        # threads overlap IO + jpeg decode without process overhead
        self.workers = max(1, workers)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _host_indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        if self.num_hosts > 1:
            # pad by wrapping so every host yields the SAME number of
            # samples (torch DistributedSampler semantics: total_size =
            # ceil(n/world)*world) — unequal counts would deadlock the
            # collective global-batch assembly in parallel.mesh.shard_batch
            total = -(-n // self.num_hosts) * self.num_hosts
            order = np.concatenate([order, order[: total - n]])
        # contiguous round-robin shard per host (DistributedSampler-like)
        return order[self.host_id :: self.num_hosts]

    def __len__(self) -> int:
        n = len(self._host_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        idx = self._host_indices()
        if self.drop_last:
            idx = idx[: len(idx) // self.batch_size * self.batch_size]
        elif len(idx) % self.batch_size:
            # wrap-pad the ragged final batch to full size: a smaller batch
            # may not divide over the dp mesh axis (parallel.mesh.shard_batch
            # shards axis 0 over dp) and would crash or silently recompile.
            # Same duplicate-sample semantics DistributedSampler already uses
            # for host padding above; eval metrics weight batch means equally
            # either way (reference tools.py:18-37).
            pad = self.batch_size - len(idx) % self.batch_size
            idx = np.resize(idx, len(idx) + pad)  # cyclic repeat
        batches = [
            idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                if self.workers > 1 and self.batch_size > 1:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(self.workers) as ex:
                        for b in batches:
                            q.put(_stack(list(
                                ex.map(lambda i: self.dataset[int(i)], b)
                            )))
                else:
                    for b in batches:
                        q.put(_stack([self.dataset[int(i)] for i in b]))
            except Exception as e:  # surface loader errors on the main thread
                q.put(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, Exception):
                raise item
            yield item


def make_loader(dataset, batch_size: int, mode: str, seed: int = 0, **kwargs) -> Loader:
    train = mode == "train"
    return Loader(
        dataset, batch_size, shuffle=train, seed=seed, drop_last=train, **kwargs
    )
