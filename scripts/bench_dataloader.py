"""Data-path throughput: examples/s for the threaded loader vs N worker
processes, against the train-step budget.

The reference trains with 10 dataloader workers (config/main.yaml:23); this
measures whether the loader keeps a dp-wide mesh fed. With no dataset in the
environment it synthesizes RE10K-format chunks (JPEG bytes + 18-float poses,
dataset_re10k.py chunk schema) and runs the real ChunkDataset -> crop-shim ->
batch path.

Usage: python scripts/bench_dataloader.py [--step-ms 155] [--dp 4]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import io
import tempfile
import time
from pathlib import Path

import numpy as np


def make_chunk(path: Path, num_scenes: int = 6, num_frames: int = 40,
               hw=(360, 640), seed: int = 0) -> None:
    import torch
    from PIL import Image

    rng = np.random.default_rng(seed)
    chunk = []
    for s in range(num_scenes):
        images = []
        for _ in range(num_frames):
            arr = (rng.random((hw[0], hw[1], 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            images.append(torch.frombuffer(bytearray(buf.getvalue()), dtype=torch.uint8))
        cameras = np.zeros((num_frames, 18), np.float32)
        cameras[:, 0] = 1.0  # fx
        cameras[:, 1] = 1.0  # fy
        cameras[:, 2] = 0.5
        cameras[:, 3] = 0.5
        w2c = np.tile(np.eye(4, dtype=np.float32)[:3].reshape(-1), (num_frames, 1))
        cameras[:, 6:] = w2c
        for i in range(num_frames):
            cameras[i, 9] = 0.1 * i  # translate x
        chunk.append(
            {"key": f"scene{seed}_{s}", "images": images,
             "cameras": torch.from_numpy(cameras)}
        )
    torch.save(chunk, path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=155.0,
                    help="train-step budget per batch")
    ap.add_argument("--dp", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--measure-batches", type=int, default=40)
    args = ap.parse_args()

    from transplat_tpu.dataset.loader import DataLoader, MultiWorkerLoader
    from transplat_tpu.dataset.re10k import ChunkDataset, DatasetCfg
    from transplat_tpu.dataset.view_samplers import BoundedCfg, ViewSamplerBounded

    tmp = tempfile.mkdtemp(prefix="dl_bench_")
    train = Path(tmp) / "train"
    train.mkdir(parents=True)
    for c in range(args.chunks):
        make_chunk(train / f"{c:06d}.torch", seed=c)
    cfg = DatasetCfg(roots=[tmp], image_shape=(256, 256))

    def measure(loader, n):
        it = iter(loader)
        next(it)  # warm
        t0 = time.perf_counter()
        got = 0
        for batch in it:
            got += batch["context"]["image"].shape[0]
            if got >= n * args.batch_size:
                break
        dt = time.perf_counter() - t0
        return got / dt

    n = args.measure_batches

    def thread_iter():
        ds = ChunkDataset(cfg, "train", ViewSamplerBounded(BoundedCfg()))
        while True:
            yield from ds.iter_examples(lambda: 0)

    ex_s_thread = measure(DataLoader(thread_iter(), args.batch_size), n)

    results = {"threaded": ex_s_thread}
    for nw in (2, 4, 8):
        def make_worker_iter(w, _nw=nw):
            ds = ChunkDataset(
                cfg, "train", ViewSamplerBounded(BoundedCfg()),
                seed=1234 + w, shard_id=w, num_shards=_nw,
            )

            def epochs():
                while True:
                    yield from ds.iter_examples(lambda: 0)

            return epochs()

        results[f"workers_{nw}"] = measure(
            MultiWorkerLoader(make_worker_iter, nw, args.batch_size), n
        )

    # Budget: a dp-wide mesh consumes dp batches per step.
    need = args.dp * args.batch_size / (args.step_ms / 1e3)
    print(f"{'loader':<12} {'examples/s':>11} {'vs dp={} need {:.1f}/s'.format(args.dp, need):>22}")
    for name, ex_s in results.items():
        print(f"{name:<12} {ex_s:>11.1f} {ex_s / need:>21.2f}x")


if __name__ == "__main__":
    main()
