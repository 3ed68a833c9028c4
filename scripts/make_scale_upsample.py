"""Build a re-keyed xN upsample of the big testdata tables into a
scratch dir, for the measured scale-slope evidence (VERDICT r10 item 1:
every 100 TB claim so far rests on plan shapes at sf0.1 -- this makes
the slope MEASURABLE without touching the read-only /root/testdata).

Usage: python scripts/make_scale_upsample.py [src_sf_dir] [dst_dir] [factor]

Honesty rules (the point is a slope measurement, not a synthetic win):

- ids are re-keyed with a per-replica offset of (max_id + 1) so joins,
  groupings and EXACT dedup see N disjoint populations -- no artificial
  cross-replica id collisions;
- document TEXT is re-salted per replica (every whitespace token gets a
  replica-letter suffix, applied on the normalized lower/collapsed form
  the dedup operators tokenize) so shingle/MinHash/substring operators
  see N independent corpora of the same length/shape distribution --
  plain text replication would make every replica pair a near-dup
  clique and grow candidate pairs O(N^2), which is a property of the
  COPYING, not of real bigger corpora (n_chars is recomputed to stay
  consistent with the salted text);
- embeddings get per-replica deterministic coordinate SIGN FLIPS:
  within-replica cosines are preserved exactly, cross-replica cosines
  decorrelate (the sign products form a +-1 pseudo-random pattern),
  so replicas do not become semantic duplicates of each other at any
  factor;
- events keep their timestamps (a 10x corpus over the same wall-clock
  window IS denser per day -- that is what scale looks like) with
  event/user ids offset per replica;
- lineitem re-keys l_orderkey only; orders and the other dims are
  copied verbatim, so only queries that DON'T join lineitem->orders
  belong in the 10x measurement set (scripts/scale_slope.py's default
  set respects this).
"""

from __future__ import annotations

import os
import shutil
import string
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the x100 lineitem write (60M rows through a 100-branch union) needs
# more than the 1g default single-JVM heap; must be set pre-launch
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 24g pyspark-shell"
)

from pyspark.sql import functions as F  # noqa: E402

from dbt_metrics_ingestion_script_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
UPSAMPLED = {"documents", "embeddings", "events", "lineitem"}


def _replicate(df, id_cols, factor, transform=None):
    """Union `factor` re-keyed replicas; replica 0 is the original."""
    offsets = {
        c: df.agg(F.max(c)).first()[0] + 1 for c in id_cols
    }
    parts = []
    for i in range(factor):
        p = df
        for c in id_cols:
            p = p.withColumn(c, F.col(c) + F.lit(i * offsets[c]))
        if transform is not None:
            p = transform(p, i)
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _salt_documents(df, i):
    if i == 0:
        return df
    # two-letter replica salt so any factor <= 676 stays unique
    salt = (
        string.ascii_lowercase[i % 26] + string.ascii_lowercase[i // 26]
    )
    salted = F.regexp_replace(F.col("text"), r"(\S+)", r"$1" + salt)
    return df.withColumn("text", salted).withColumn(
        "n_chars", F.length("text").cast("long")
    )


def _decorrelate_embedding(df, i):
    """Per-replica deterministic coordinate SIGN FLIPS: cosine within a
    replica is preserved EXACTLY (both vectors flip the same signs),
    while cross-replica cosines decorrelate (the sign products form a
    +-1 pseudo-random pattern), so replicas never become semantic
    duplicates of each other.  Works at any factor, unlike the round-11
    first-cut cyclic rotation (undefined past dim, and rotation
    collisions would create exact cross-replica duplicates)."""
    if i == 0:
        return df
    import hashlib

    def sign(d: int) -> float:
        h = hashlib.md5(f"flip:{i}:{d}".encode()).hexdigest()
        return 1.0 if int(h[:2], 16) % 2 == 0 else -1.0

    dim = 64
    signs = F.array(*[F.lit(sign(d)) for d in range(dim)])
    flipped = F.zip_with("embedding", signs, lambda x, s: x * s)
    return df.withColumn("embedding", flipped)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scratch_scale/x10"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dst_p = Path(dst)
    dst_p.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="make_scale_upsample", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    for t in TABLES:
        src_file = f"{src}/{t}.parquet"
        out = dst_p / f"{t}.parquet"
        if t not in UPSAMPLED:
            if out.exists():
                if out.is_dir():
                    shutil.rmtree(out)
                else:
                    out.unlink()
            shutil.copy(src_file, out)
            print(f"{t}: copied")
            continue
        df = spark.read.parquet(src_file)
        if t == "documents":
            up = _replicate(df, ["doc_id"], factor, _salt_documents)
        elif t == "embeddings":
            up = _replicate(df, ["vec_id"], factor, _decorrelate_embedding)
        elif t == "events":
            up = _replicate(df, ["event_id", "user_id"], factor)
        else:  # lineitem
            up = _replicate(df, ["l_orderkey"], factor)
        up.write.mode("overwrite").parquet(str(out))
        n = spark.read.parquet(str(out)).count()
        print(f"{t}: x{factor} -> {n} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
