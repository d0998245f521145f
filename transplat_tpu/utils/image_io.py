"""Image/video IO (mirrors /root/reference/src/misc/image_io.py)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def to_uint8(image: np.ndarray) -> np.ndarray:
    """(h, w, 3) float [0,1] -> uint8."""
    return (np.clip(np.asarray(image), 0.0, 1.0) * 255.0).astype(np.uint8)


def save_image(image: np.ndarray, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(to_uint8(image)).save(path)


def load_image(path: str | Path) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0


def save_video(frames: list[np.ndarray], path: str | Path, fps: int = 30) -> None:
    """Save frames as mp4 via cv2 (ffmpeg-free)."""
    import cv2

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for frame in frames:
        writer.write(cv2.cvtColor(to_uint8(frame), cv2.COLOR_RGB2BGR))
    writer.release()
