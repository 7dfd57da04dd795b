from . import metrics, preprocess

__all__ = ["metrics", "preprocess"]
