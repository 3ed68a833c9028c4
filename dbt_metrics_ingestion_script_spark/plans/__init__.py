from .metric_spec import MetricFilter, MetricSpec
from .compiler import MetricCompiler, compile_filter

__all__ = ["MetricFilter", "MetricSpec", "MetricCompiler", "compile_filter"]
