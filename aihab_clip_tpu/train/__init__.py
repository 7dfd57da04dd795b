from .evaluate import evaluate, make_eval_step
from .tracker import ClassificationTracker

__all__ = ["ClassificationTracker", "evaluate", "make_eval_step"]
