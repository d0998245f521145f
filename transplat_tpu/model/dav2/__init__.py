from .dpt import DepthAnythingV2, DAV2_CONFIGS

__all__ = ["DepthAnythingV2", "DAV2_CONFIGS"]
