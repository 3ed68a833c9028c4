"""Parquet emission log: the canonical pure-Spark sink.

Instead of a per-entity network hop, the emission frame lands as a
partitioned parquet table -- replayable, idempotent (overwrite per run),
and scalable to any entity count.  A downstream shipper (or the
RestSink) can stream it out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class EmissionLogSink:
    def __init__(self, path: str, mode: str = "overwrite") -> None:
        self.path = path
        self.mode = mode

    def emit(self, emissions: DataFrame) -> dict:
        (
            emissions.write.mode(self.mode)
            .partitionBy("entity_kind")
            .parquet(self.path)
        )
        return {"mode": "emission_log", "path": self.path}
