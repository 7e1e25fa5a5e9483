from tpuflow.eval.metrics import compute_all_metrics
from tpuflow.eval.patterns import TEST_PATTERNS, MotionParameters

__all__ = ["compute_all_metrics", "TEST_PATTERNS", "MotionParameters"]
