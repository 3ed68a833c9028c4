"""Manifest -> executable metrics bridge: the end-to-end integration of
Layer A (manifest frontend) and Layer B (metric compiler).

The reference only *describes* metrics (it ships their definitions to a
catalog); this bridge makes the same manifest records runnable: each
record becomes a MetricSpec (tolerant extraction,
/root/reference/dbt_metrics_to_datahub.py:125-150 semantics), derived
metrics resolve their inputs from the same manifest, and a
caller-supplied resolver maps dbt model ids to physical DataFrames
(e.g. the warehouse tables with the manifest's column names).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.manifest import ManifestFrames, load_manifest
from .compiler import MetricCompiler
from .metric_spec import MetricSpec


_MAX_SPECS = 100_000  # driver-side guard; see docstring


def specs_from_manifest(frames: ManifestFrames) -> dict[str, MetricSpec]:
    """All manifest metric records as a name -> MetricSpec registry.

    The record's executable model is its first non-metric dependency
    (dbt metrics depend on exactly one model/source plus, for derived
    metrics, other metrics).

    Metric DEFINITIONS are driver-side metadata (each compiles to a
    plan, so the driver must hold them anyway -- same posture as the
    reference's json.load); the collect here is deliberate.  The guard
    below turns a pathologically large manifest into a loud error
    instead of a silent driver OOM.
    """
    n = frames.metrics.count()
    if n > _MAX_SPECS:
        raise ValueError(
            f"manifest has {n} metric records (> {_MAX_SPECS}); "
            "a registry this size cannot be compiled driver-side -- "
            "shard the manifest or raise _MAX_SPECS explicitly"
        )
    specs: dict[str, MetricSpec] = {}
    for row in frames.metrics.collect():
        rec = row.asDict(recursive=True)
        rec["model"] = next(
            (n for n in (rec.get("depends_on") or []) if not n.startswith("metric.")),
            "",
        )
        spec = MetricSpec.from_manifest_record(rec)
        specs[spec.name] = spec
    return specs


def manifest_compiler(
    spark: SparkSession,
    manifest_path: str,
    resolver: Callable[[str], DataFrame],
) -> MetricCompiler:
    """Compiler pre-loaded with every metric in the manifest; compile any
    of them by name via `compiler.registry[name]`."""
    frames = load_manifest(spark, manifest_path)
    specs = specs_from_manifest(frames)
    return MetricCompiler(resolver, registry=specs)
