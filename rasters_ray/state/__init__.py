from .gridindex import GridNNIndex
from .rtree import STRtree

__all__ = ["GridNNIndex", "STRtree"]
