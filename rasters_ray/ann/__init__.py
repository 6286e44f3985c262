from .search import BruteForceTopK, LSHBuckets, cosine_topk, lsh_topk, recall_at_k

__all__ = ["BruteForceTopK", "LSHBuckets", "cosine_topk", "lsh_topk", "recall_at_k"]
