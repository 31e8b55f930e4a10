from . import asof, dedup, merge, multimodal, similarity

__all__ = ["asof", "dedup", "merge", "multimodal", "similarity"]
