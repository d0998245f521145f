from .loader import DataLoader, synthetic_batch
from .view_samplers import (
    ViewSamplerBounded,
    ViewSamplerEvaluation,
    ViewSamplerArbitrary,
    ViewSamplerAll,
    get_view_sampler,
)

__all__ = [
    "DataLoader",
    "synthetic_batch",
    "ViewSamplerBounded",
    "ViewSamplerEvaluation",
    "ViewSamplerArbitrary",
    "ViewSamplerAll",
    "get_view_sampler",
]
