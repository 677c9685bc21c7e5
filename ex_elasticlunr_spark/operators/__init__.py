from . import ann, dedup, multimodal, quality

__all__ = ["ann", "dedup", "multimodal", "quality"]
