"""Multimodal (binary) column plumbing (SURVEY §2.11 north-star).

Images/audio/video are opaque ``binary`` payloads plus a typed metadata
struct; decode / feature-extraction runs as Arrow-batched ``mapInPandas``
so each Python worker sees a columnar batch (one serde per batch, not per
row) — the only sane shape for CPU-heavy per-item media work on Spark.

The decode itself is STUBBED (no media libraries in this container): the
"decoder" emits deterministic fake features derived from payload bytes, and
`decode_image` raises ``NotImplementedError`` to mark the real integration
point. Everything around it — schema, batching, partitioning, UDF
signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct every multimodal column carries alongside the payload
MEDIA_META_FIELDS = "n_bytes bigint, mime string, source string"

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, mime string, width int, height int, "
    "feat array<float>"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", mime: str = "application/octet-stream"
) -> DataFrame:
    """Pack a column into (payload binary, meta struct) — the landed shape
    a real ingest would produce for media files."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit(mime).alias("mime"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decoder integration point — requires pillow/opencv, absent here."""
    raise NotImplementedError(
        "media decode needs an image library (pillow/opencv) not present in "
        "this environment; extract_features uses a deterministic stub"
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a real decode: 8 'features' from payload
    byte statistics, plus fake dimensions. Replace with decode_image."""
    payloads = pdf["payload"]
    n_bytes = payloads.map(len)
    feats = payloads.map(
        lambda b: [
            float(len(b)),
            float(b[0] if len(b) else 0),
            float(b[-1] if len(b) else 0),
            float(sum(b[:64]) % 256),
            float(min(b) if len(b) else 0),
            float(max(b) if len(b) else 0),
            float(len(set(b[:256]))),
            float((len(b) * 2654435761) % 997),
        ]
    )
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes,
            "mime": pdf["mime"],
            "width": (n_bytes % 1024).astype("int32"),
            "height": ((n_bytes * 3) % 1024).astype("int32"),
            "feat": feats,
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta) rows.

    ``mapInPandas`` keeps the binary payloads inside the executor and
    yields one columnar batch per input batch; repartition upstream if
    media items are large enough that a 128 MB input split holds too many.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    flat = media.select(
        "doc_id", "payload", F.col("meta.mime").alias("mime")
    )
    return flat.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# resize + frame-sample plumbing (decode stubbed, batch shape real)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = "doc_id bigint, width int, height int, payload binary"
FRAME_SCHEMA = "doc_id bigint, frame_index int, frame_offset bigint, frame binary"


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize tier: mapInPandas over (doc_id, payload) batches.

    The pixel work is stubbed (no imaging libs here): the "resized" payload
    is a deterministic fixed-length digest of the original bytes, standing
    in for the real ``decode → resample → re-encode`` kernel. The Spark
    shape is the real one: binary in/binary out, one Arrow batch per serde,
    constant output size per row (the property downstream training shards
    rely on)."""

    target = width * height // 64  # stand-in output length

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: bytes((b[i % len(b)] if len(b) else 0) for i in range(target))
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling tier: one input row fans out to ≤ max_frames
    frame rows (mapInPandas may change cardinality — that is the point).

    A real codec would seek keyframes; the stub slices the payload at
    fixed byte offsets, which preserves the contract that matters for the
    pipeline: per-frame rows carry (doc_id, frame_index, offset, bytes)
    and partitioning stays by source row, so a downstream
    ``groupBy(doc_id)`` reassembles without a shuffle surprise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_index": [], "frame_offset": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = min(max_frames, max(len(payload) // every_n_bytes, 1))
                for i in range(n):
                    off = i * every_n_bytes
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i)
                    out["frame_offset"].append(off)
                    out["frame"].append(bytes(payload[off : off + every_n_bytes]))
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)
