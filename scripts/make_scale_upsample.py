"""Build a re-keyed xN upsample of the big testdata tables into a
scratch dir, for the measured scale-slope evidence (VERDICT r10 item 1:
every 100 TB claim so far rests on plan shapes at sf0.1 -- this makes
the slope MEASURABLE without touching the read-only /root/testdata).

Usage:
  python scripts/make_scale_upsample.py [src_sf_dir] [dst_dir] [factor]
         [--salt-mode full|lang] [--skew none|zipf] [--tables a,b,...]

Honesty rules (the point is a slope measurement, not a synthetic win):

- ids are re-keyed with a per-replica offset of (max_id + 1) so joins,
  groupings and EXACT dedup see N disjoint populations -- no artificial
  cross-replica id collisions;
- orders and lineitem re-key o_orderkey/l_orderkey with the SAME offset
  (max o_orderkey + 1 -- every l_orderkey exists in orders, so one
  offset preserves referential integrity inside every replica; VERDICT
  r11 item 1).  o_custkey and l_partkey/l_suppkey stay verbatim, so
  dim joins remain valid and each customer simply owns N orders -- a
  denser history, which is what scale looks like;
- document TEXT, --salt-mode full (default): every whitespace token
  gets a replica-letter suffix, so shingle/MinHash/substring operators
  see N independent corpora of the same length/shape distribution --
  plain replication would make every replica pair a near-dup clique
  and grow candidate pairs O(N^2), a property of the COPYING, not of
  real bigger corpora (n_chars is recomputed to stay consistent);
- document TEXT, --salt-mode lang (VERDICT r11 item 5): the full salt
  destroys the stopword/language signals, so the quality-filter family
  measured ~replica-0 survivors at x10.  lang mode replaces the LAST
  character of every NON-PROTECTED token with the replica letter --
  token lengths, char counts, stopword/marker hits and the whole
  repetition profile are preserved EXACTLY (the testdata vocabulary
  has no two words sharing their first len-1 chars, so the relabeling
  is injective per replica), which makes every per-document quality
  statistic identical to replica 0's and the honest survivor growth
  exactly xN.  Protected tokens: LANG_MARKERS (all languages) union
  QUALITY_STOPWORDS.  Cross-replica shingle independence is NOT a goal
  of this mode -- it exists for the map-only quality family, not for
  the dedup family (use full mode there);
- --skew zipf (VERDICT r11 item 2): replicas i > 0 route half their
  rows to ONE hot key -- events get event_type='hot' on even event
  ids (~45% of the xN corpus in one group key), documents get a fixed
  16-token HOT_SENTENCE appended on even doc ids (~45% of docs share
  its 8-gram windows -- a boilerplate gram whose groupBy/join-back
  behavior is exactly what the substring de-skew defends against).
  The skewed corpus is for TIMING slopes only;
- embeddings get per-replica deterministic coordinate SIGN FLIPS:
  within-replica cosines are preserved exactly, cross-replica cosines
  decorrelate, so replicas do not become semantic duplicates at any
  factor;
- events keep their timestamps (a 10x corpus over the same wall-clock
  window IS denser per day -- that is what scale looks like) with
  event/user ids offset per replica.
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
UPSAMPLED = {"documents", "embeddings", "events", "lineitem", "orders"}

# --skew zipf: the boilerplate sentence appended to even docs (16
# tokens -> 9 full 8-gram windows shared by ~45% of the corpus)
HOT_SENTENCE = (
    "hash join hash join shuffle spill shuffle spill "
    "hash join hash join shuffle spill shuffle spill"
)


def _replica_letter(i: int) -> str:
    return string.ascii_lowercase[i % 26]


def _replicate(df, id_cols, factor, transform=None, offsets=None):
    """Union `factor` re-keyed replicas; replica 0 is the original.
    offsets optionally overrides the per-column offset (used to keep
    orders and lineitem on the SAME o_orderkey offset)."""
    offs = dict(offsets or {})
    for c in id_cols:
        if c not in offs:
            offs[c] = df.agg(F.max(c)).first()[0] + 1
    parts = []
    for i in range(factor):
        p = df
        for c in id_cols:
            p = p.withColumn(c, F.col(c) + F.lit(i * offs[c]))
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


def _protected_words() -> list[str]:
    """LANG_MARKERS (every language) union QUALITY_STOPWORDS -- the
    tokens the quality/lang family's statistics depend on."""
    import re

    from dbt_metrics_ingestion_script_spark.operators.text import (
        LANG_MARKERS,
        QUALITY_STOPWORDS,
    )

    words = set(QUALITY_STOPWORDS)
    for pat in LANG_MARKERS.values():
        words.update(re.findall(r"[a-zü]+", pat.replace(r"\b", "")))
    return sorted(words)


def _salt_documents_lang(df, i):
    """Language-preserving salt: replace the LAST char of every
    non-protected token with the replica letter.  Token lengths,
    n_chars, stopword/marker counts and the within-doc repetition
    profile are all EXACTLY preserved, so per-document quality rules
    fire identically in every replica (survivors grow exactly xN)."""
    if i == 0:
        return df
    letter = _replica_letter(i)
    alts = "|".join(_protected_words())
    # match a full \S+ token that is not a protected word and has no
    # digit; capture all but the last char, replace the last char
    pat = rf"(?<!\S)(?!(?:{alts})(?!\S))(?!\S*[0-9])(\S*)\S(?!\S)"
    return df.withColumn(
        "text", F.regexp_replace(F.col("text"), pat, r"$1" + letter)
    )


def _skew_documents(df, i):
    """zipf mode: even doc ids in replicas i > 0 gain the (unsalted)
    HOT_SENTENCE -- one boilerplate n-gram family shared by ~45% of
    the corpus."""
    if i == 0:
        return df
    hot = F.col("doc_id") % 2 == 0
    return df.withColumn(
        "text",
        F.when(hot, F.concat(F.col("text"), F.lit(" " + HOT_SENTENCE)))
        .otherwise(F.col("text")),
    ).withColumn("n_chars", F.length("text").cast("long"))


def _skew_events(df, i):
    """zipf mode: even event ids in replicas i > 0 collapse onto ONE
    hot event_type (~45% of the xN corpus in one group key)."""
    if i == 0:
        return df
    hot = F.col("event_id") % 2 == 0
    return df.withColumn(
        "event_type",
        F.when(hot, F.lit("hot")).otherwise(F.col("event_type")),
    )


def _compose(*transforms):
    def t(df, i):
        for f in transforms:
            df = f(df, i)
        return df
    return t


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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {}
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--"):
            flags[a[2:]] = next(it)
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else "/root/repo/scratch_scale/x10"
    factor = int(args[2]) if len(args) > 2 else 10
    salt_mode = flags.get("salt-mode", "full")
    skew = flags.get("skew", "none")
    only = set(flags["tables"].split(",")) if "tables" in flags else None
    dst_p = Path(dst)
    dst_p.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="make_scale_upsample", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    salt_doc = (
        _salt_documents_lang if salt_mode == "lang" else _salt_documents
    )
    doc_transform = (
        _compose(salt_doc, _skew_documents) if skew == "zipf" else salt_doc
    )
    ev_transform = _skew_events if skew == "zipf" else None

    # one offset keeps lineitem->orders referential integrity per
    # replica (every l_orderkey is an o_orderkey; max(o) >= max(l))
    okey_offset = None

    for t in TABLES:
        if only is not None and t not in only:
            continue
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
        if t in ("orders", "lineitem") and okey_offset is None:
            okey_offset = (
                spark.read.parquet(f"{src}/orders.parquet")
                .agg(F.max("o_orderkey"))
                .first()[0]
                + 1
            )
        if t == "documents":
            up = _replicate(df, ["doc_id"], factor, doc_transform)
        elif t == "embeddings":
            up = _replicate(df, ["vec_id"], factor, _decorrelate_embedding)
        elif t == "events":
            up = _replicate(
                df, ["event_id", "user_id"], factor, ev_transform
            )
        elif t == "orders":
            up = _replicate(
                df, ["o_orderkey"], factor,
                offsets={"o_orderkey": okey_offset},
            )
        else:  # lineitem
            up = _replicate(
                df, ["l_orderkey"], factor,
                offsets={"l_orderkey": okey_offset},
            )
        up.write.mode("overwrite").parquet(str(out))
        n = spark.read.parquet(str(out)).count()
        print(f"{t}: x{factor} -> {n} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
