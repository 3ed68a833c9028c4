"""Engine-portable 64-bit hashing.

Spark's hash()/xxhash64 and DuckDB's hash() use different algorithms, so
sketch operators built on them could never be differentially tested.
Instead: bigint from the first 15 hex chars of md5 -- identical in any
engine with md5 + hex conversion, and uniform enough for MinHash/LSH
bucketing.  (md5 here is a content fingerprint, not security.)

DuckDB equivalent:  ('0x' || substr(md5(x), 1, 15))::BIGINT
Spark SQL:          conv(substring(md5(x), 1, 15), 16, 10)::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


DUCKDB_HASH64 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
