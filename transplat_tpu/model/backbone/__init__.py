from .cnn import CNNEncoder
from .transformer import MultiViewFeatureTransformer
from .multiview import BackboneMultiview

__all__ = ["CNNEncoder", "MultiViewFeatureTransformer", "BackboneMultiview"]
