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

# ---------------------------------------------------------------------------
# portable universal-hash family over 31-bit values
# ---------------------------------------------------------------------------
#
# MinHash needs k independent hashes per shingle.  Hashing the string k
# times (md5 per permutation) is the naive form and dominates runtime;
# instead hash the string ONCE to a 31-bit value and derive the family
# arithmetically: h_i(x) = (a_i * x + b_i) mod p, p = 2^31 - 1.
# All operands stay < 2^31, so products fit in int64 on every engine --
# no overflow, no wrap-semantics divergence, bit-identical in DuckDB.

MERSENNE31 = (1 << 31) - 1


def _family_coeffs(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for permutation i (LCG-scrambled)."""
    a = (1103515245 * (i + 1) + 12345) % MERSENNE31
    b = (69069 * (i + 1) + 1234567) % MERSENNE31
    return (a or 1, b)


def hash31(col: Column | str) -> Column:
    """Portable 31-bit content hash (hash64 masked to 31 bits)."""
    return hash64(col).bitwiseAND(F.lit(MERSENNE31))


def family_hash(h31: Column, i: int) -> Column:
    """i-th universal hash of a 31-bit value; cheap JVM arithmetic."""
    a, b = _family_coeffs(i)
    return (F.lit(a) * h31 + F.lit(b)) % F.lit(MERSENNE31)


DUCKDB_HASH31 = f"({DUCKDB_HASH64} & {MERSENNE31})"


def duckdb_family_hash(x: str, i: int) -> str:
    a, b = _family_coeffs(i)
    return f"(({a} * {x} + {b}) % {MERSENNE31})"
