"""Multimodal (binary) column plumbing (SURVEY §2.11 north-star).

Images/audio/video are opaque ``binary`` payloads plus a typed metadata
struct; decode / feature-extraction runs as Arrow-batched ``mapInPandas``
so each Python worker sees a columnar batch (one serde per batch, not per
row) — the only sane shape for CPU-heavy per-item media work on Spark.

Decode is REAL for two formats a stdlib-only container can parse:

- **PPM (P6)** images — header + raw RGB triples; `decode_ppm` returns
  true width/height plus per-channel means.
- **WAV** audio — RIFF container via the stdlib ``wave`` module;
  `decode_wav` returns true duration/framerate/channels plus an RMS
  loudness feature.

Formats that genuinely need external codecs (PNG/JPEG/MP4…) raise
``NotImplementedError`` at the same `decode_media` boundary — swap the
dispatch table to pillow/opencv/ffmpeg on a real cluster; the Spark
plumbing (schema, batching, partitioning, UDF signatures) is unchanged.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct every multimodal column carries alongside the payload
MEDIA_META_FIELDS = "n_bytes bigint, mime string, source string"

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, mime string, width int, height int, "
    "duration_s double, feat array<float>"
)

PPM_MIME = "image/x-portable-pixmap"
WAV_MIME = "audio/x-wav"


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


def synthesize_ppm(key: int, seed_text: str) -> bytes:
    """Deterministic small P6 PPM: dimensions from the key, pixels from an
    md5 keystream of the text — a real, decodable image fixture."""
    width = 4 + key % 5
    height = 3 + key % 4
    need = width * height * 3
    seed = hashlib.md5(seed_text.encode("utf-8")).digest()
    pixels = (seed * (need // len(seed) + 1))[:need]
    return f"P6\n{width} {height}\n255\n".encode("ascii") + pixels


# synthesize_wav's payload is a pure function of (framerate, n_frames,
# freq), and both derived params cycle with key % 10 — so a whole corpus
# contains at most 10 distinct WAV byte strings, while the per-frame
# sin + struct.pack loop costs ~1 ms per call. Memoizing the ≤10
# payloads per process (guide §4.5: amortize heavyweight per-row work
# across the task/worker lifetime) turns the dominant Python cost of the
# media synth pass into ~10 calls total; the returned bytes are
# bit-identical to the uncached computation by construction.
_WAV_CACHE: dict[tuple[int, int, float], bytes] = {}


def synthesize_wav(key: int) -> bytes:
    """Deterministic mono 16-bit 8 kHz sine WAV, 0.1–0.5 s by key — a
    real, decodable audio fixture."""
    framerate = 8000
    n_frames = 800 + (key % 5) * 800
    freq = 200.0 + (key % 10) * 50.0
    params = (framerate, n_frames, freq)
    cached = _WAV_CACHE.get(params)
    if cached is not None:
        return cached
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(
            b"".join(
                struct.pack("<h", int(12000 * math.sin(2 * math.pi * freq * i / framerate)))
                for i in range(n_frames)
            )
        )
    data = buf.getvalue()
    _WAV_CACHE[params] = data  # ≤10 entries: params cycle with key % 10
    return data


def attach_synthetic_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, payload, meta) with REAL decodable payloads — even ids get
    a PPM image, odd ids a WAV clip. mapInPandas so payload bytes are
    born on the executors and never cross to the driver; deterministic in
    (id, text) so reruns land bit-identical fixtures."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                key = int(doc_id)
                if key % 2 == 0:
                    payloads.append(synthesize_ppm(key, str(text)))
                    mimes.append(PPM_MIME)
                else:
                    payloads.append(synthesize_wav(key))
                    mimes.append(WAV_MIME)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "mime": mimes}
            )

    flat = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        gen, schema="doc_id bigint, payload binary, mime string"
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.length("payload").cast("bigint").alias("n_bytes"),
            F.col("mime").alias("mime"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


def decode_ppm(payload: bytes) -> dict:
    """Stdlib P6-PPM decode: true width/height/maxval + per-channel means.

    Binary PPM is ``P6 <ws> width <ws> height <ws> maxval <single-ws>``
    followed by width·height RGB triples; ``#`` starts a comment through
    end-of-line anywhere in the header."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary (P6) PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raw pixel data
    width, height, maxval = fields
    if maxval > 255:
        # spec-valid but 2 bytes/sample — silently halving the read would
        # produce garbage channel means from a function billed as a REAL
        # decoder; refuse instead.
        raise ValueError(f"PPM maxval {maxval} > 255 (16-bit samples) unsupported")
    need = width * height * 3
    pixels = payload[pos : pos + need]
    if len(pixels) < need:
        raise ValueError(f"truncated PPM: want {need} pixel bytes, have {len(pixels)}")
    n_px = width * height
    means = [sum(pixels[c::3]) / n_px for c in range(3)]
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "mean_r": means[0],
        "mean_g": means[1],
        "mean_b": means[2],
    }


def decode_wav(payload: bytes) -> dict:
    """Stdlib WAV decode via ``wave``: true duration/framerate/channels
    plus RMS loudness over the first 4096 16-bit samples."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        framerate = w.getframerate()
        sampwidth = w.getsampwidth()
        n_frames = w.getnframes()
        head = w.readframes(min(n_frames, 4096 // max(n_channels, 1)))
    rms = 0.0
    if sampwidth == 2 and len(head) >= 2:
        samples = struct.unpack(f"<{len(head) // 2}h", head[: len(head) // 2 * 2])
        rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    return {
        "n_channels": n_channels,
        "framerate": framerate,
        "sampwidth": sampwidth,
        "n_frames": n_frames,
        "duration_s": n_frames / framerate if framerate else 0.0,
        "rms": rms,
    }


def decode_media(payload: bytes, mime: str) -> dict:
    """Mime-dispatched decode — the single integration boundary. Formats
    needing external codecs raise here; swap entries in on a real cluster."""
    if mime == PPM_MIME:
        return decode_ppm(payload)
    if mime in (WAV_MIME, "audio/wav"):
        return decode_wav(payload)
    raise NotImplementedError(
        f"no stdlib decoder for {mime!r}; PNG/JPEG/MP4… need pillow/opencv/"
        "ffmpeg, not present in this environment"
    )


def decode_image(payload: bytes) -> dict:
    """Image decode: PPM handled natively, anything else needs pillow/opencv."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    raise NotImplementedError(
        "media decode for non-PPM images needs an image library "
        "(pillow/opencv) not present in this environment"
    )


def _byte_stat_features(b: bytes) -> list[float]:
    """Cheap content features computed for EVERY payload regardless of
    format (the 'always-available' feature tier)."""
    return [
        float(len(b)),
        float(b[0] if len(b) else 0),
        float(b[-1] if len(b) else 0),
        float(sum(b[:64]) % 256),
        float(min(b) if len(b) else 0),
        float(max(b) if len(b) else 0),
        float(len(set(b[:256]))),
        float((len(b) * 2654435761) % 997),
    ]


def _decode_batch(pdf: pd.DataFrame, strict: bool) -> pd.DataFrame:
    out: dict[str, list] = {
        "doc_id": [], "n_bytes": [], "mime": [], "width": [],
        "height": [], "duration_s": [], "feat": [],
    }
    for doc_id, payload, mime in zip(pdf["doc_id"], pdf["payload"], pdf["mime"]):
        b = bytes(payload)
        width = height = None
        duration = None
        feat = _byte_stat_features(b)
        # non-strict contract: a malformed payload degrades to the
        # byte-stat feature tier instead of killing the whole job — one
        # corrupt row in a crawl batch must not abort the stage.
        try:
            if mime == PPM_MIME:
                d = decode_ppm(b)
                width, height = d["width"], d["height"]
                feat = feat[:5] + [d["mean_r"], d["mean_g"], d["mean_b"]]
            elif mime in (WAV_MIME, "audio/wav"):
                d = decode_wav(b)
                duration = d["duration_s"]
                feat = feat[:5] + [
                    float(d["framerate"]), float(d["n_channels"]), d["rms"]
                ]
            elif strict:
                decode_media(b, mime)  # raises NotImplementedError loudly
        except NotImplementedError:
            raise
        except Exception:
            if strict:
                raise
            width = height = duration = None
            feat = _byte_stat_features(b)
        out["doc_id"].append(doc_id)
        out["n_bytes"].append(len(b))
        out["mime"].append(mime)
        out["width"].append(width)
        out["height"].append(height)
        out["duration_s"].append(duration)
        out["feat"].append(feat)
    return pd.DataFrame(out)


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta) rows.

    ``mapInPandas`` keeps the binary payloads inside the executor and
    yields one columnar batch per input batch; repartition upstream if
    media items are large enough that a 128 MB input split holds too many.

    PPM and WAV payloads get REAL decoded dimensions/duration (stdlib
    codecs above); other mimes get byte-stat features with NULL
    width/height/duration — or, with ``strict=True``, a loud
    ``NotImplementedError`` instead of silently-degraded features.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf, strict)

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


# ---------------------------------------------------------------------------
# perceptual-hash near-dup (REAL decode path: PPM → aHash → banded match)
# ---------------------------------------------------------------------------

PHASH_GRID = 8  # 8×8 grid → 64-bit average hash
PHASH_BANDS = 4  # 4 × 16-bit bands → pigeonhole-exact for hamming ≤ 3


def ppm_average_hash(payload: bytes) -> int:
    """64-bit average hash (aHash) of a P6 PPM: true decode → grayscale →
    8×8 nearest-sample grid → bit i set iff cell i ≥ grid mean.

    The standard perceptual fingerprint for image near-dup mining
    (identical layout survives re-encode/noise; hamming distance ≈ visual
    distance). Stdlib-only; returns a SIGNED 64-bit int so the value fits
    Spark's LongType unchanged."""
    d = decode_ppm(payload)
    w, h = d["width"], d["height"]
    hdr_end = _ppm_pixel_offset(payload)
    px = payload[hdr_end : hdr_end + w * h * 3]
    g = PHASH_GRID
    cells = []
    for gy in range(g):
        sy = (gy * h) // g
        for gx in range(g):
            sx = (gx * w) // g
            o = (sy * w + sx) * 3
            cells.append(px[o] + px[o + 1] + px[o + 2])  # 3× grayscale
    mean = sum(cells) / len(cells)
    bits = 0
    for i, c in enumerate(cells):
        if c >= mean:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def _ppm_pixel_offset(payload: bytes) -> int:
    """Byte offset of the raw pixel data in a P6 PPM (header re-walk,
    comment-aware — mirrors decode_ppm's parser)."""
    pos = 2
    fields = 0
    while fields < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields += 1
    return pos + 1


def phash_rows(media: DataFrame) -> DataFrame:
    """(doc_id, phash) for every PPM payload — Arrow-batched mapInPandas;
    non-PPM rows are dropped (they have no image hash). Payload bytes stay
    on the executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload, mime in zip(pdf["doc_id"], pdf["payload"], pdf["mime"]):
                if mime != PPM_MIME:
                    continue
                ids.append(doc_id)
                hashes.append(ppm_average_hash(bytes(payload)))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "phash": pd.Series(hashes, dtype="int64")})

    flat = media.select("doc_id", "payload", F.col("meta.mime").alias("mime"))
    return flat.mapInPandas(run, schema="doc_id bigint, phash bigint")


def synth_phash_rows(
    docs: DataFrame,
    id_shift: int,
    delta: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fused synth → perturb → hash pass for the phash near-dup entry
    (r15): ONE ``mapInPandas`` over (doc_id, text) emits (doc_id, phash)
    for each even-id PPM *and* its last-byte-perturbed twin
    (doc_id + id_shift) — the exact rows
    ``phash_rows(media ∪ perturb_payloads(media))`` produces over
    ``attach_synthetic_media`` output, without three separate Python
    passes or a payload cache in between. Payload bytes are born,
    perturbed and hashed inside a single task and never cross the
    JVM↔Python boundary at all (guide §8: every shuffle/boundary but the
    last moves a lightweight proxy — here the 8-byte hash). Odd-id rows
    (WAV in the attach dispatch) carry no image hash and are skipped
    without being synthesized."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                key = int(doc_id)
                if key % 2 != 0:
                    continue
                b = synthesize_ppm(key, str(text))
                ids.append(key)
                hashes.append(ppm_average_hash(b))
                tb = bytes(b[:-1]) + bytes([(b[-1] + delta) % 256])
                ids.append(key + id_shift)
                hashes.append(ppm_average_hash(tb))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, schema="doc_id bigint, phash bigint"
    )


def phash_pairs_from_hashes(h: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Banded near-dup pairs over (doc_id, phash) rows — the join half of
    ``phash_neardup_pairs``, split out (r15) so hash rows from the fused
    synth pass can feed it directly."""
    assert max_hamming <= PHASH_BANDS - 1, "pigeonhole needs bands > hamming"
    width = 64 // PHASH_BANDS
    mask = (1 << width) - 1
    bands = h.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned("phash", b * width).bitwiseAND(F.lit(mask)).alias("key"),
                )
                for b in range(PHASH_BANDS)
            ])
        ).alias("bk"),
    ).select("doc_id", "phash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def phash_neardup_pairs(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-dup pairs (id_a < id_b, hamming ≤ max_hamming) via the
    same pigeonhole banding as SimHash (plans/northstar.py d_simhash_pairs):
    split the 64-bit aHash into PHASH_BANDS equal bands — any pair within
    max_hamming ≤ PHASH_BANDS-1 total differing bits must agree on ≥ 1
    band, so a per-band equality self-join is EXACT (zero false
    negatives), then popcount(XOR) filters candidates. Scale shape: the
    only shuffle is the band-key join — no all-pairs product; hot bands
    (flat images) are bounded by the 2^16 band-value space."""
    return phash_pairs_from_hashes(phash_rows(media), max_hamming)


def perturb_payloads(media: DataFrame, id_shift: int, delta: int = 7) -> DataFrame:
    """Noisy twin of every media row: id shifted by ``id_shift``, LAST
    payload byte nudged by ``delta`` (mod 256) — for a P6 PPM that is one
    channel of one pixel, so the twin is a true near-duplicate of the
    original image (the fixture a phash near-dup test needs). Meta is
    recomputed; mime/source carried through."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(b[:-1]) + bytes([(b[-1] + delta) % 256]) if len(b) else b
                for b in (bytes(p) for p in pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"] + id_shift,
                    "payload": payloads,
                    "mime": pdf["mime"],
                }
            )

    flat = media.select(
        "doc_id", "payload", F.col("meta.mime").alias("mime")
    ).mapInPandas(run, schema="doc_id bigint, payload binary, mime string")
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.length("payload").cast("bigint").alias("n_bytes"),
            F.col("mime").alias("mime"),
            F.lit("synthetic-twin").alias("source"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# files-from-disk ingestion (Spark binaryFile source)
# ---------------------------------------------------------------------------

MEDIA_EXT_MIME = {"ppm": PPM_MIME, "wav": WAV_MIME}


def read_media_dir(spark, path: str, glob: str | None = None) -> DataFrame:
    """Real media-file ingestion via Spark's ``binaryFile`` source:
    every file under ``path`` becomes (doc_id, payload, meta) in exactly
    the shape `attach_synthetic_media` produces, so the downstream tier
    (`extract_features` / `resize_images` / `sample_frames`) runs
    unchanged on disk-born bytes.

    Scale notes: binaryFile reads file contents ON THE EXECUTORS
    (payloads never route through the driver); ``pathGlobFilter`` prunes
    at listing time, and the source exposes (path, length,
    modificationTime) for free — length lands in the meta struct without
    touching the bytes. doc_id = the numeric file stem when the name is
    ``<digits>.<ext>`` (the layout our writers produce), else a stable
    hash of the full path."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    stem = F.regexp_replace(name, r"\.[^.]+$", "")
    ext = F.lower(F.regexp_extract(name, r"\.([^.]+)$", 1))
    mime = F.lit("application/octet-stream")
    for e, m in MEDIA_EXT_MIME.items():
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    doc_id = F.when(
        stem.rlike(r"^[0-9]+$"), stem.cast("bigint")
    ).otherwise(F.xxhash64(F.col("path")))
    return df.select(
        doc_id.alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("length").cast("bigint").alias("n_bytes"),
            mime.alias("mime"),
            F.lit("file").alias("source"),
        ).alias("meta"),
    )
