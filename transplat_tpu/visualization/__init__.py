from .trajectory import (
    generate_wobble,
    generate_wobble_transformation,
    interpolate_extrinsics,
    interpolate_intrinsics,
    generate_spin,
)
from .layout import hcat, vcat, add_border, add_label
from .color_map import apply_color_map_to_image

__all__ = [
    "generate_wobble",
    "generate_wobble_transformation",
    "interpolate_extrinsics",
    "interpolate_intrinsics",
    "generate_spin",
    "hcat",
    "vcat",
    "add_border",
    "add_label",
    "apply_color_map_to_image",
]
