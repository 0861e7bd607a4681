"""X4 multimodal columns: image/audio/video as opaque BINARY + typed
metadata, with Arrow-batched decode/feature plumbing over ``mapInPandas``.

The container ships no image/audio codecs, so the actual decode is STUBBED:
``decode_image_real`` raises NotImplementedError (clearly marked), and
``decode_image_fake`` produces a deterministic fake feature vector from the
bytes so the Spark-side plumbing — schema, batch shape, partitioning — is
real and tested end-to-end.

Design for 100 TB: media bytes never leave the executor as Python objects
row-by-row; ``mapInPandas`` streams Arrow record batches, and the UDF
operates on whole pandas columns.  Metadata (dims, codec, byte size) travels
in a sibling STRUCT column so filters prune *before* any decode happens.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed metadata carried beside every media BLOB
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

#: output schema of the fake decoder (real one would add pixel tensors)
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Materialize an opaque-binary media column from the documents fixture:
    bytes = utf-8 encoding of the text (stand-in for real image bytes) plus
    a typed metadata struct."""
    data = F.encode(F.col("text"), "utf-8")
    return df.select(
        "doc_id",
        data.alias("media_bytes"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake/utf8").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )


try:  # optional dependency: real image codec
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # container ships no codecs — fake path stays primary
    _PILImage = None
    HAS_PIL = False


def decode_image_real(payload: bytes) -> dict:
    """REAL decode path, active when Pillow is importable: decode the image
    bytes and return ``{width, height, mode, feature}`` where ``feature`` is
    an 8-dim strided mean over the raw pixel bytes (the same shape the fake
    decoder emits, so downstream schema is identical).  Raises
    NotImplementedError when no codec is installed — callers that need a
    never-fails path use ``decode_media_real`` (per-row fake fallback)."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL/opencv; not available in this "
            "environment. decode_media_real falls back to the fake decoder."
        )
    import io

    img = _PILImage.open(io.BytesIO(payload))
    img.load()
    px = img.tobytes()
    dim = 8
    n = len(px)
    feature = [
        round(
            (sum(px[i] for i in range(d, n, dim)) / max(1, len(range(d, n, dim))))
            / 255.0,
            6,
        )
        if n > d
        else 0.0
        for d in range(dim)
    ]
    return {
        "width": img.width,
        "height": img.height,
        "mode": img.mode,
        "feature": feature,
    }


def _fake_feature_sig(buf: bytes, dim: int = 8) -> list[int]:
    """Integer form of the fake feature: per-dimension strided byte sums
    mod 1000.  Pure integer arithmetic so an ANSI-SQL oracle can replicate
    it exactly (DuckDB: nested list comprehension over ascii codes — the
    fixture text is ASCII, so code point == utf-8 byte)."""
    if not buf:
        return [0] * dim
    n = len(buf)
    return [
        (sum(buf[i] for i in range(d, n, dim)) if n > d else 0) % 1000
        for d in range(dim)
    ]


def _fake_feature(buf: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding' derived from byte statistics — stands
    in for a real decoder's feature output, keeps tests meaningful."""
    return [round(s / 1000.0, 6) for s in _fake_feature_sig(buf, dim)]


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake decode: one pandas DataFrame per record batch in,
    one out.  This function's *shape* (Iterator[pd.DataFrame] ->
    Iterator[pd.DataFrame]) is exactly what a real decoder would use."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["media_bytes"].map(lambda b: len(b) if b is not None else 0),
                "feature": pdf["media_bytes"].map(_fake_feature),
            }
        )


def decode_media(df: DataFrame) -> DataFrame:
    """Run the (fake) decoder over the media table via mapInPandas.

    Partitioning note: decode is CPU-bound and embarrassingly parallel —
    repartition upstream by size, never by key, and let each Arrow batch
    stay whole."""
    return df.select("doc_id", "media_bytes").mapInPandas(
        decode_media_batch, schema=DECODED_SCHEMA
    )


#: output schema of the real-or-fallback decoder
REAL_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_media_real_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode that PREFERS the real codec: per row, try
    Pillow; on any failure (no codec installed, or bytes that are not a
    decodable image — e.g. this repo's utf-8 fixture payloads) fall back to
    the deterministic fake feature with NULL dimensions and decoded=false.
    Same Iterator[pd.DataFrame] shape as ``decode_media_batch``."""
    for pdf in batches:
        rows = {
            "doc_id": [],
            "n_bytes": [],
            "width": [],
            "height": [],
            "decoded": [],
            "feature": [],
        }
        for doc_id, buf in zip(pdf["doc_id"], pdf["media_bytes"]):
            buf = buf or b""
            rows["doc_id"].append(doc_id)
            rows["n_bytes"].append(len(buf))
            real = None
            if HAS_PIL:
                try:
                    real = decode_image_real(buf)
                except Exception:  # undecodable payload -> fake fallback
                    real = None
            if real is not None:
                rows["width"].append(real["width"])
                rows["height"].append(real["height"])
                rows["decoded"].append(True)
                rows["feature"].append(real["feature"])
            else:
                rows["width"].append(None)
                rows["height"].append(None)
                rows["decoded"].append(False)
                rows["feature"].append(_fake_feature(buf))
        yield pd.DataFrame(rows)


def decode_media_real(df: DataFrame) -> DataFrame:
    """Run the real-when-available decoder over the media table via
    mapInPandas — the production entry point once codecs are installed; in
    codec-less environments every row takes the documented fake fallback
    (decoded=false), so the pipeline shape is identical either way."""
    return df.select("doc_id", "media_bytes").mapInPandas(
        decode_media_real_batch, schema=REAL_DECODED_SCHEMA
    )


def media_metadata_summary(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — must prune the BLOB column from the scan
    (verify with .explain: ReadSchema excludes media_bytes)."""
    return df.groupBy(F.col("media_meta.media_type").alias("media_type")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("media_meta.n_bytes")).alias("total_bytes"),
    )


#: output schema of the frame sampler: one row per sampled frame
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_offset", T.LongType(), False),
        T.StructField("feature_json", T.StringType(), False),
    ]
)


def sample_frames_batch(n_frames: int = 4, frame_bytes: int = 64):
    """Build an Arrow-batched frame sampler: treat the media BLOB as a
    'video' byte stream, take ``n_frames`` evenly spaced ``frame_bytes``
    windows (real impl: container demux + keyframe decode — same UDTF-like
    one-row-in/many-rows-out shape), and emit a deterministic fake feature
    per frame as JSON (driver-canonicalizable, no array cells)."""
    import json

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_offset": [], "feature_json": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["media_bytes"]):
                buf = buf or b""
                n = len(buf)
                step = max(n // n_frames, 1)
                for k in range(n_frames):
                    off = min(k * step, max(n - 1, 0))
                    window = buf[off : off + frame_bytes]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(k)
                    rows["frame_offset"].append(off)
                    # integer signature, compact separators -> byte-identical
                    # to the DuckDB oracle's '[' || array_to_string(...) || ']'
                    rows["feature_json"].append(
                        json.dumps(_fake_feature_sig(window, 4), separators=(",", ":"))
                    )
            yield pd.DataFrame(rows)

    return _sample


def sample_frames(df: DataFrame, *, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Frame sampling over the media table: one input row fans out to
    ``n_frames`` output rows via mapInPandas (the explode-shaped media
    transform — video -> frame features for a multimodal training set).

    Scale: fan-out happens inside the Arrow batch (no shuffle); downstream
    per-frame ops inherit the input partitioning.  Deterministic: frame
    offsets are a pure function of the byte length."""
    return df.select("doc_id", "media_bytes").mapInPandas(
        sample_frames_batch(n_frames, frame_bytes), schema=FRAME_SCHEMA
    )


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("start_byte", T.LongType(), False),
        T.StructField("end_byte", T.LongType(), False),
        T.StructField("energy", T.DoubleType(), False),
        T.StructField("energy_raw", T.LongType(), False),
    ]
)


def chunk_audio_batch(chunk_bytes: int = 256, hop_bytes: int = 192):
    """Build an Arrow-batched audio chunker: treat the media BLOB as a PCM
    byte stream and emit overlapping ``chunk_bytes`` windows every
    ``hop_bytes`` (hop < chunk = the standard 25ms/10ms audio framing; real
    impl: codec decode then sample windows — identical fan-out shape).
    Per-chunk 'energy' is a deterministic mean-byte proxy (rounded scalar,
    driver-canonicalizable)."""

    def _chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [],
                "chunk_idx": [],
                "start_byte": [],
                "end_byte": [],
                "energy": [],
                "energy_raw": [],
            }
            for doc_id, buf in zip(pdf["doc_id"], pdf["media_bytes"]):
                buf = buf or b""
                n = len(buf)
                start, idx = 0, 0
                while start < n:
                    w = buf[start : start + chunk_bytes]
                    rows["doc_id"].append(doc_id)
                    rows["chunk_idx"].append(idx)
                    rows["start_byte"].append(start)
                    rows["end_byte"].append(start + len(w))
                    rows["energy"].append(round(sum(w) / (255.0 * len(w)), 6))
                    # integer byte sum: the SQL-oracle-checkable companion
                    rows["energy_raw"].append(sum(w))
                    start += hop_bytes
                    idx += 1
            yield pd.DataFrame(rows)

    return _chunk


def chunk_audio(
    df: DataFrame, *, chunk_bytes: int = 256, hop_bytes: int = 192
) -> DataFrame:
    """Audio chunking over the media table: one row fans out to a
    variable number of overlapping windows via mapInPandas (audio ->
    frame-features for a speech training set; sibling of ``sample_frames``
    which emits a fixed per-row arity).  Fan-out stays inside the Arrow
    batch — no shuffle; chunk boundaries are a pure function of byte
    length, so the op is deterministic and replay-safe."""
    return df.select("doc_id", "media_bytes").mapInPandas(
        chunk_audio_batch(chunk_bytes, hop_bytes), schema=AUDIO_CHUNK_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("src_h", T.IntegerType(), False),
        T.StructField("src_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("pixels_sig", T.StringType(), False),
    ]
)


def resize_image_batch(src_w: int = 16, out_h: int = 8, out_w: int = 8):
    """Build an Arrow-batched nearest-neighbor resizer: the media BLOB is
    treated as a 1-channel ``src_w``-wide image (height = ceil(n/src_w));
    output pixel (r, c) samples source pixel (r*H//out_h, c*src_w//out_w)
    — the standard NN downsample index map, out-of-range (ragged last
    row) reads as 0.  The real implementation swaps this loop for
    PIL.Image.resize on decoded pixels (decode_image_real's guard); the
    SPARK-side plumbing — Arrow batches, schema, partition-parallelism —
    is identical, which is what the fixture verifies."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [],
                "src_h": [],
                "src_w": [],
                "out_h": [],
                "out_w": [],
                "pixels_sig": [],
            }
            for doc_id, buf in zip(pdf["doc_id"], pdf["media_bytes"]):
                buf = buf or b""
                n = len(buf)
                h = max((n + src_w - 1) // src_w, 1)
                px = []
                for r in range(out_h):
                    for c in range(out_w):
                        idx = (r * h // out_h) * src_w + (c * src_w // out_w)
                        px.append(buf[idx] if idx < n else 0)
                rows["doc_id"].append(doc_id)
                rows["src_h"].append(h)
                rows["src_w"].append(src_w)
                rows["out_h"].append(out_h)
                rows["out_w"].append(out_w)
                rows["pixels_sig"].append(",".join(str(p) for p in px))
            yield pd.DataFrame(rows)

    return _resize


def resize_images(
    df: DataFrame, *, src_w: int = 16, out_h: int = 8, out_w: int = 8
) -> DataFrame:
    """Image resize over the media table via mapInPandas: one row per
    image, constant output size — the preprocessing step that normalizes a
    multimodal corpus to a model's input resolution.  No shuffle; batches
    stream through Arrow; a resized corpus is a narrow map of the raw
    one."""
    return df.select("doc_id", "media_bytes").mapInPandas(
        resize_image_batch(src_w, out_h, out_w), schema=RESIZE_SCHEMA
    )
