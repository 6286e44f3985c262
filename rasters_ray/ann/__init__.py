from .search import BruteForceTopK, LSHBuckets, cosine_topk, lsh_topk

__all__ = ["BruteForceTopK", "LSHBuckets", "cosine_topk", "lsh_topk"]
