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
- embeddings are coordinate-ROTATED per replica (cyclic shift by i):
  norm and coordinate distribution are preserved, but a random vector
  and its rotation are essentially orthogonal in high dimension, so
  replicas do not become semantic duplicates of each other;
- events keep their timestamps (a 10x corpus over the same wall-clock
  window IS denser per day -- that is what scale looks like) with
  event/user ids offset per replica;
- lineitem re-keys l_orderkey only; orders and the other dims are
  copied verbatim, so only queries that DON'T join lineitem->orders
  belong in the 10x measurement set (scripts/scale_slope.py's default
  set respects this).
"""

from __future__ import annotations

import shutil
import string
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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
    letter = string.ascii_lowercase[i]
    salted = F.regexp_replace(F.col("text"), r"(\S+)", r"$1" + letter)
    return df.withColumn("text", salted).withColumn(
        "n_chars", F.length("text").cast("long")
    )


def _rotate_embedding(df, i):
    if i == 0:
        return df
    n = F.size("embedding")
    rotated = F.concat(
        F.slice(F.col("embedding"), F.lit(i + 1), n - F.lit(i)),
        F.slice(F.col("embedding"), 1, i),
    )
    return df.withColumn("embedding", rotated)


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
            up = _replicate(df, ["vec_id"], factor, _rotate_embedding)
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
