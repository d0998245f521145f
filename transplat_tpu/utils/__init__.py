from .benchmarker import Benchmarker

__all__ = ["Benchmarker"]
