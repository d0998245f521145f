"""Host-side example/batch structures (numpy, channel-last).

Mirrors /root/reference/src/dataset/types.py but in NHWC numpy:
  views = {image (v,h,w,3) f32, intrinsics (v,3,3), extrinsics (v,4,4),
           near (v,), far (v,), index (v,)}
  example = {context: views, target: views, scene: str}
Batched variants stack a leading batch axis.
"""

from __future__ import annotations

from typing import TypedDict

import numpy as np


class Views(TypedDict):
    image: np.ndarray
    intrinsics: np.ndarray
    extrinsics: np.ndarray
    near: np.ndarray
    far: np.ndarray
    index: np.ndarray


class Example(TypedDict):
    context: Views
    target: Views
    scene: str
