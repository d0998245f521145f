"""Convert the raw DTU dataset into reference-format .torch chunks.

Mirrors /root/reference/src/scripts/convert_dtu.py: read MVSNet-style camera
files (Cameras/train/XXXXXXXX_cam.txt, world scaled by 1/200, intrinsics x4),
normalize intrinsics by the principal point, pack raw PNG bytes + 18-float
camera rows into ~100MB chunks under <out>/test.

Usage: python scripts/convert_dtu.py --input_dir <dtu_raw> --output_dir <out>
"""



from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
from pathlib import Path

import numpy as np
import torch

TARGET_BYTES_PER_CHUNK = int(1e8)
SCALE_FACTOR = 1.0 / 200

EVAL_SCANS = [
    "scan1_train", "scan8_train", "scan21_train", "scan30_train",
    "scan31_train", "scan34_train", "scan38_train", "scan40_train",
    "scan41_train", "scan45_train", "scan55_train", "scan63_train",
    "scan82_train", "scan103_train", "scan110_train", "scan114_train",
]


def read_cam_file(filename: Path):
    lines = [line.rstrip() for line in open(filename).readlines()]
    extrinsic = np.fromstring(" ".join(lines[1:5]), dtype=np.float32, sep=" ").reshape(4, 4)
    intrinsic = np.fromstring(" ".join(lines[7:10]), dtype=np.float32, sep=" ").reshape(3, 3)
    depth_min = float(lines[11].split()[0]) * SCALE_FACTOR
    depth_max = depth_min + float(lines[11].split()[1]) * 192 * SCALE_FACTOR
    return intrinsic, extrinsic, (depth_min, depth_max)


def build_camera_info(id_list, root_dir: Path):
    intrinsics, world2cams = {}, {}
    for vid in id_list:
        intrinsic, extrinsic, _ = read_cam_file(
            root_dir / "Cameras/train" / f"{vid:08d}_cam.txt"
        )
        intrinsic[:2] *= 4
        extrinsic[:3, 3] *= SCALE_FACTOR
        intrinsics[vid] = intrinsic
        world2cams[vid] = extrinsic
    return intrinsics, world2cams


def load_metadata(intrinsics, world2cams):
    timestamps, cameras = [], []
    for vid, intr in intrinsics.items():
        timestamps.append(int(vid))
        fx, fy, cx, cy = intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2]
        w, h = 2.0 * cx, 2.0 * cy
        camera = [fx / w, fy / h, 0.5, 0.5, 0.0, 0.0]
        camera.extend(world2cams[vid][:3].flatten().tolist())
        cameras.append(np.asarray(camera, np.float32))
    return {
        "url": "",
        "timestamps": torch.tensor(timestamps, dtype=torch.int64),
        "cameras": torch.tensor(np.stack(cameras), dtype=torch.float32),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    args = parser.parse_args()
    in_dir = Path(args.input_dir)
    out_dir = Path(args.output_dir)

    intrinsics, world2cams = build_camera_info(list(range(49)), in_dir)

    stage = "test"
    stage_dir = out_dir / stage
    stage_dir.mkdir(parents=True, exist_ok=True)

    chunk, chunk_size, chunk_index = [], 0, 0

    def save_chunk():
        nonlocal chunk, chunk_size, chunk_index
        path = stage_dir / f"{chunk_index:06d}.torch"
        print(f"saving {path} ({chunk_size / 1e6:.1f} MB, {len(chunk)} scenes)")
        torch.save(chunk, path)
        chunk, chunk_size, chunk_index = [], 0, chunk_index + 1

    for key in EVAL_SCANS:
        image_dir = in_dir / "Rectified" / key
        example = load_metadata(intrinsics, world2cams)
        images = []
        size = 0
        for vid in example["timestamps"].tolist():
            path = image_dir / f"rect_{vid + 1:03d}_3_r5000.png"
            raw = np.fromfile(path, dtype=np.uint8)
            size += raw.nbytes
            images.append(torch.from_numpy(raw))
        example["images"] = images
        example["key"] = key
        chunk.append(example)
        chunk_size += size
        print(f"  added {key} ({size / 1e6:.1f} MB)")
        if chunk_size >= TARGET_BYTES_PER_CHUNK:
            save_chunk()
    if chunk:
        save_chunk()

    index = {}
    for chunk_path in sorted(stage_dir.glob("*.torch")):
        for example in torch.load(chunk_path, weights_only=False):
            index[example["key"]] = chunk_path.name
    with open(stage_dir / "index.json", "w") as f:
        json.dump(index, f)
    print(f"indexed {len(index)} scenes")


if __name__ == "__main__":
    main()
