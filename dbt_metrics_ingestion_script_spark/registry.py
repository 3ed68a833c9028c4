"""Query registry shared by all query modules.

Every operator from SURVEY.md §2 registers a (spark_fn, oracle_sql)
pair; `__spark_entry__.py` exposes the registry to the driver's
differential harness (DuckDB oracle at sf0.01).  oracle=None marks a
non-SQL-expressible operator (rows-only driver check).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    driver: bool = True  # exposed to the driver registry; every such
    # entry is ELIGIBLE for the driver's sampled per-round oracle
    # evaluation (the driver samples ~50 slots per round -- unsampled
    # entries are covered by the committed full-registry
    # scripts/driver_sim.py run, DRIVERSIM_r{N}.txt, and pytest).
    # driver=False keeps the (fn, oracle) pair for pytest differential
    # coverage only -- used for O(n^2) brute-force baselines that exist
    # to verify the registered scale paths, not to be run at scale
    # themselves


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, driver: bool = True):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn, oracle, driver)
        return fn

    return deco


def round_cols(df: DataFrame, cols: dict[str, int]) -> DataFrame:
    """Round named float columns identically to the oracle (sum order
    differs between engines at the ulp level)."""
    out = df
    for c, n in cols.items():
        out = out.withColumn(c, F.round(F.col(c), n))
    return out
