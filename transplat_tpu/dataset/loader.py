"""Host data loading: batching, prefetch, synthetic fixtures.

Replaces the reference's Lightning DataModule + worker processes
(/root/reference/src/dataset/data_module.py) with a simple threaded prefetch
iterator producing numpy NHWC batches ready for jax device_put / sharding.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


def _stack_examples(examples: list) -> dict:
    def stack_views(key):
        views = [e[key] for e in examples]
        return {
            k: np.stack([v[k] for v in views]) for k in views[0] if k != "index"
        } | {"index": np.stack([np.asarray(v["index"]) for v in views])}

    return {
        "context": stack_views("context"),
        "target": stack_views("target"),
        "scene": [e["scene"] for e in examples],
    }


class DataLoader:
    """Batches an example iterator with background prefetch."""

    def __init__(self, dataset, batch_size: int, prefetch: int = 4, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            buf = []
            try:
                for example in self.dataset:
                    buf.append(example)
                    if len(buf) == self.batch_size:
                        q.put(_stack_examples(buf))
                        buf = []
                if buf and not self.drop_last:
                    q.put(_stack_examples(buf))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


class MultiWorkerLoader:
    """Process-parallel batch loading (the reference's num_workers > 0
    DataLoader, config/main.yaml:23 uses 10 train workers).

    make_worker_iter(worker_id) -> iterable of examples; each worker process
    assembles whole batches from its own chunk shard and pushes them through
    one shared queue (batch order across workers is nondeterministic, as
    with torch's IterableDataset + workers). Forked workers inherit the
    factory closure, so curriculum state must be shared explicitly — pass a
    multiprocessing.Value and read it inside the closure (the reference's
    StepTracker shared-memory tensor, src/misc/step_tracker.py).
    """

    def __init__(
        self,
        make_worker_iter,
        num_workers: int,
        batch_size: int,
        prefetch: int = 4,
        finite: bool = False,
    ):
        self.make_worker_iter = make_worker_iter
        self.num_workers = max(1, num_workers)
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.finite = finite

    def _worker(self, worker_id: int, q) -> None:
        buf = []
        try:
            for example in self.make_worker_iter(worker_id):
                buf.append(example)
                if len(buf) == self.batch_size:
                    q.put(_stack_examples(buf))
                    buf = []
        finally:
            q.put(None)  # per-worker sentinel (finite datasets)

    def __iter__(self) -> Iterator[dict]:
        import multiprocessing as mp

        ctx = mp.get_context("fork")
        q = ctx.Queue(maxsize=self.prefetch * self.num_workers)
        procs = [
            ctx.Process(target=self._worker, args=(w, q), daemon=True)
            for w in range(self.num_workers)
        ]
        for p in procs:
            p.start()
        done = 0
        try:
            while done < self.num_workers:
                item = q.get()
                if item is None:
                    done += 1
                    continue
                yield item
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
            for p in procs:
                p.join(timeout=2)


def synthetic_batch(
    key: int = 0,
    batch_size: int = 1,
    num_context: int = 2,
    num_target: int = 2,
    image_shape: tuple[int, int] = (256, 256),
    near: float = 1.0,
    far: float = 100.0,
) -> dict:
    """Random posed batch for tests/benchmarks (no dataset required)."""
    rng = np.random.default_rng(key)
    h, w = image_shape

    def views(v):
        intr = np.tile(
            np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], np.float32),
            (batch_size, v, 1, 1),
        )
        extr = np.tile(np.eye(4, dtype=np.float32), (batch_size, v, 1, 1))
        for i in range(v):
            extr[:, i, 0, 3] = 0.25 * i + 0.05 * rng.standard_normal(batch_size)
            extr[:, i, 1, 3] = 0.02 * rng.standard_normal(batch_size)
        return {
            "image": rng.random((batch_size, v, h, w, 3), np.float32),
            "intrinsics": intr,
            "extrinsics": extr,
            "near": np.full((batch_size, v), near, np.float32),
            "far": np.full((batch_size, v), far, np.float32),
            "index": np.tile(np.arange(v), (batch_size, 1)),
        }

    return {
        "context": views(num_context),
        "target": views(num_target),
        "scene": [f"synthetic_{i}" for i in range(batch_size)],
    }
