from .base import Sink, NoopSink, collect_emissions
from .emission_log import EmissionLogSink
from .rest import RestSink

__all__ = ["Sink", "NoopSink", "EmissionLogSink", "RestSink", "collect_emissions"]
