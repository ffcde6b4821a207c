"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas`` plumbing.

The reference treats media files as opaque bytes on disk and shells out
to per-format tooling (ffmpeg subprocess transforms,
twinspect/transformations/audio.py:105-186; per-file codec UDFs,
twinspect/algos/iscc.py:12-88). Spark-native: media lives IN the table
as a ``binary`` column, and decode/feature/frame-sample stages are
``mapInPandas`` operators over Arrow record batches — schema declared up
front, batch-size capped by ``spark.sql.execution.arrow.maxRecordsPerBatch``
so a partition of large blobs can't blow executor memory.

Decode backends: the real image/audio codecs are NOT installed in this
environment, so ``backend="real"`` raises NotImplementedError at the
exact seam where PIL/ffmpeg would plug in; ``backend="fake"`` is a
deterministic stand-in (metadata derived from byte length) that keeps
every piece of Spark plumbing — schema, batching, partitioning, row
expansion — real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, content binary, n_bytes long"
)
DECODED_SCHEMA = (
    "media_id long, media_type string, n_bytes long,"
    " width int, height int, n_frames int, sample_rate int"
)
FEATURES_SCHEMA = "media_id long, features array<double>"
FRAMES_SCHEMA = "media_id long, frame_idx int, byte_offset long"


def as_media_table(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) → media(media_id, media_type,
    content: binary, n_bytes). Deterministic round-robin media_type so
    per-type code paths all execute; content is the UTF-8 bytes (the
    driver's synthetic stand-in for real blobs)."""
    t = F.col("doc_id") % 3
    media_type = (
        F.when(t == 0, "img").when(t == 1, "audio").otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        media_type.alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def _fake_decode(pdf: pd.DataFrame) -> pd.DataFrame:
    n = pdf["n_bytes"].to_numpy(dtype=np.int64)
    is_video = (pdf["media_type"] == "video").to_numpy()
    is_audio = (pdf["media_type"] == "audio").to_numpy()
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "n_bytes": pdf["n_bytes"],
            "width": (16 + n % 64).astype("int32"),
            "height": (16 + (n // 64) % 64).astype("int32"),
            "n_frames": np.where(is_video, 1 + n % 8, 1).astype("int32"),
            "sample_rate": np.where(is_audio, 8000 + (n % 4) * 8000, 0).astype(
                "int32"
            ),
        }
    )


def filter_media(
    decoded: DataFrame,
    min_bytes: int | None = None,
    max_bytes: int | None = None,
    min_duration_s: float | None = None,
    max_duration_s: float | None = None,
) -> DataFrame:
    """F6: size/duration admission predicates over the decoded media
    table (reference fma.py:106-125 filters FMA tracks to >=60 s; file
    size guards appear throughout its dataset builders). Duration is
    derived as n_frames / sample_rate where sample_rate > 0 (audio /
    video rows); pure column predicates, pushed to the scan when the
    decoded table is stored."""
    out = decoded
    if min_bytes is not None:
        out = out.where(F.col("n_bytes") >= min_bytes)
    if max_bytes is not None:
        out = out.where(F.col("n_bytes") <= max_bytes)
    if min_duration_s is not None or max_duration_s is not None:
        dur = F.col("n_frames") / F.col("sample_rate")
        has_dur = F.col("sample_rate") > 0
        if min_duration_s is not None:
            out = out.where(~has_dur | (dur >= min_duration_s))
        if max_duration_s is not None:
            out = out.where(~has_dur | (dur <= max_duration_s))
    return out


def decode_media(media: DataFrame, backend: str = "fake") -> DataFrame:
    """Per-blob metadata decode as a mapInPandas stage. ``fake`` derives
    deterministic metadata from byte length; ``real`` is the seam for
    actual codecs (PIL / soundfile / pyav), absent in this container."""
    if backend == "real":
        raise NotImplementedError(
            "real media decode requires PIL/soundfile/pyav (not installed);"
            " plug the codec into _fake_decode's slot"
        )
    if backend != "fake":
        raise ValueError(f"unknown decode backend: {backend}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode(pdf)

    return media.mapInPandas(gen, schema=DECODED_SCHEMA)


def byte_histogram_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Content features from the raw bytes: L1-normalized ``bins``-bucket
    byte-value histogram per blob (a real, deterministic feature — the
    embedding stand-in for media similarity). numpy inside Arrow batches;
    never per-row Python at the DataFrame level."""
    width = 256 // bins

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["content"]:
                arr = np.frombuffer(blob, dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * bins)
                    continue
                hist = np.bincount(arr // width, minlength=bins)[:bins]
                feats.append((hist / arr.size).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.mapInPandas(gen, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every: int = 4096) -> DataFrame:
    """Row-expanding sampler: one output row per sampled frame offset
    (every ``every`` bytes) for video blobs — the 1→N mapInPandas shape
    used by real frame extraction."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            ids, idxs, offs = [], [], []
            for mid, n in zip(vids["media_id"], vids["n_bytes"]):
                offsets = range(0, int(n), every)
                ids.extend([mid] * len(offsets))
                idxs.extend(range(len(offsets)))
                offs.extend(offsets)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                }
            )

    return media.mapInPandas(gen, schema=FRAMES_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, thumb binary"


def resize_media(
    media: DataFrame, width: int = 8, height: int = 8, backend: str = "fake"
) -> DataFrame:
    """Thumbnail/resize stage: fixed-size payload per blob — the
    image/video preprocessing step between decode and feature
    extraction. ``fake`` backend produces a deterministic width×height
    byte grid by nearest-neighbor sampling of the raw byte stream
    (``idx_i = i * n_bytes // (w*h)``, zero-padded when the blob is
    shorter) so the Spark plumbing — 1→1 mapInPandas, declared binary
    output schema, Arrow batch shape, constant output size per row — is
    real and testable; ``real`` is the PIL/pyav seam (not installed
    here). Output payload is w*h bytes regardless of input size, which
    is the property downstream batch-stacking (np.stack over Arrow
    batches) relies on.
    """
    if backend == "real":
        raise NotImplementedError(
            "real resize requires PIL/pyav (not installed); plug the"
            " codec into the fake sampler's slot"
        )
    if backend != "fake":
        raise ValueError(f"unknown resize backend: {backend}")
    m = width * height

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for blob in pdf["content"]:
                arr = np.frombuffer(blob, dtype=np.uint8)
                if arr.size == 0:
                    thumbs.append(bytes(m))
                    continue
                idx = (np.arange(m, dtype=np.int64) * arr.size) // m
                thumbs.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "thumb": thumbs,
                }
            )

    return media.mapInPandas(gen, schema=RESIZED_SCHEMA)


PHASH_SALTS = 3  # sha256 chain length -> 96 pseudo-pixel bytes (72 used)
PHASH_GRID_W = 9  # dHash grid: 9x8 pixels -> 8x8 horizontal gradients


def phash64_expr(content, backend: str = "fake"):
    """64-bit dHash (difference hash — the classic perceptual-hash
    family: downscale to a 9x8 grayscale grid, bit = pixel brighter
    than its right neighbor) as ONE pure column expression over a
    binary media column.

    ``backend="real"`` is the decoder seam (PIL/ffmpeg are not in this
    environment) and raises exactly where a real decode-and-downscale
    would plug in — the gradient/packing logic below is what it would
    feed. ``backend="fake"`` derives the deterministic 9x8 pseudo-pixel
    grid from the blob bytes themselves (a PHASH_SALTS-long sha256
    chain → 72 bytes, one full-blob scan), so byte-identical blobs get
    identical codes
    and everything downstream — gradient bits, packed 64-bit code, the
    Hamming-ball candidate join — is the real pipeline, SQL-replayable
    with no UDF anywhere. Bit 63 lands in the sign position; the packed
    sum of distinct powers never carries, so the signed long IS the
    64-bit pattern (same convention as the SimHash codes)."""
    if backend == "real":
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg; plug the decoder in here"
            " and keep the 9x8 downscale + gradient identical"
        )
    return phash_pack(phash_grid_hex(content))


def phash_grid_hex(content):
    """Stage 1 of the dHash: the 96-byte pseudo-pixel grid as one hex
    string (a sha256 CHAIN: h0 = sha256(blob), then h_{s} =
    sha256(hex(h0) || salt) — the tail digests hash a 65-char string,
    not the blob, so the full blob is scanned ONCE instead of
    PHASH_SALTS times; at media blob sizes that was the whole cost of
    the fake decode). Materialize this as its OWN projection column
    before packing — phash_pack references the grid 72 times, and
    feeding it an unmaterialized expression would re-evaluate the
    digests per pixel."""
    h0 = F.sha2(content, 256)
    return F.concat(
        h0,
        *[
            F.sha2(
                F.encode(
                    F.concat(h0, F.lit(str(s))), "UTF-8"
                ),
                256,
            )
            for s in range(1, PHASH_SALTS)
        ],
    )


def phash_pack(hexcol):
    """Stage 2 of the dHash: 72 pixel bytes out of the hex grid,
    64 horizontal-gradient bits packed into a signed long (bit 63 in
    the sign position; distinct powers never carry, so the signed value
    IS the bit pattern)."""
    px = [
        F.conv(F.substring(hexcol, 2 * j + 1, 2), 16, 10).cast("long")
        for j in range(PHASH_GRID_W * 8)
    ]
    code = F.lit(0).cast("long")
    for r in range(8):
        for c in range(8):
            i = r * PHASH_GRID_W + c
            code = code + F.shiftleft(
                (px[i] > px[i + 1]).cast("long"), r * 8 + c
            )
    return code
