"""Utilities: profiling and metric writers."""

from multi_modal_regression_tpu.utils.profiling import profile_trace, StepTimer
from multi_modal_regression_tpu.utils.metrics_writer import MetricsWriter

__all__ = ["profile_trace", "StepTimer", "MetricsWriter"]
