from .metrics import MultiLabelEvaluator
from .threshold import evaluate_model, find_optimal_threshold

__all__ = ["MultiLabelEvaluator", "evaluate_model", "find_optimal_threshold"]
