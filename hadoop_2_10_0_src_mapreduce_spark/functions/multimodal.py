"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed via Arrow-batched mapInPandas.

Extension beyond the reference (Hadoop MR had BytesWritable and nothing
else for media). The Spark-side design is the real deliverable here:

- media rows are (id, kind, media: binary, meta: struct) — the binary
  never explodes into Python objects row-by-row; mapInPandas sees
  whole Arrow batches.
- decode/resize/feature-extract run per batch; REAL codec work (PIL/
  ffmpeg/torchaudio) is not available in this container, so the codec
  boundary is explicit: ``decode_image`` tries PIL and otherwise
  raises NotImplementedError, while the deterministic FAKE container
  format below exercises every seam (schema, batching, partitioning,
  UDF signatures) end-to-end in tests.

FAKE container layout (big-endian):
    magic  b"FAKE"
    kind   1 byte  (1=image, 2=audio, 3=video)
    width  uint16 | sample_rate uint16 | n_frames uint16
    height uint16 | duration_ms uint16 | frame_bytes uint16
    payload bytes

At 100 TB: binary payloads dominate I/O — keep them in their own
parquet column (column pruning skips them for metadata-only queries),
partition by kind/date, and size ``maxPartitionBytes`` so one Arrow
batch of payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MAGIC = b"FAKE"
KINDS = {1: "image", 2: "audio", 3: "video"}

META_SCHEMA = "id long, kind string, a int, b int, payload_len int"
FEATURE_DIM = 8


def pack_fake_media(kind: int, a: int, b: int, payload: bytes) -> bytes:
    """Build a FAKE-container blob (test/data-gen helper)."""
    return MAGIC + _struct.pack(">BHH", kind, a, b) + payload


def _parse(blob: bytes) -> tuple[int, int, int, bytes]:
    if blob[:4] != MAGIC:
        raise ValueError("not a FAKE container")
    kind, a, b = _struct.unpack(">BHH", blob[4:9])
    return kind, a, b, blob[9:]


def decode_meta(df: DataFrame, media_col: str = "media", id_col: str = "id") -> DataFrame:
    """Parse container headers → typed metadata, batch-at-a-time.
    (The 'cheap pass': header-only reads, payload untouched.)"""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [_parse(bytes(m)) for m in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "kind": [KINDS.get(k, "unknown") for k, _, _, _ in parsed],
                    "a": [a for _, a, _, _ in parsed],
                    "b": [b for _, _, b, _ in parsed],
                    "payload_len": [len(p) for _, _, _, p in parsed],
                }
            )

    return df.select(id_col, media_col).mapInPandas(batches, META_SCHEMA)


def decode_image(blob: bytes):
    """REAL image decode — the codec boundary. Works if PIL is
    installed; otherwise NotImplementedError (this container has no
    image libs; the FAKE path below covers the Spark plumbing)."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - PIL absent on-box
        raise NotImplementedError(
            "image decoding requires PIL; install pillow on the cluster "
            "or use the FAKE-container test path"
        ) from e
    return Image.open(io.BytesIO(blob))  # pragma: no cover


def extract_features(
    df: DataFrame, media_col: str = "media", id_col: str = "id"
) -> DataFrame:
    """Deterministic stand-in feature extractor: sha256(payload) →
    FEATURE_DIM floats in [0,1). Stands where a vision/audio encoder
    would run; the contract (binary in, fixed-dim float vector out,
    Arrow-batched) is the real one."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for m in pdf[media_col]:
                _, _, _, payload = _parse(bytes(m))
                digest = hashlib.sha256(payload).digest()
                vec = np.frombuffer(digest[: FEATURE_DIM * 4], dtype=">u4")
                feats.append((vec / 2**32).astype(float).tolist())
            yield pd.DataFrame({"id": pdf[id_col].values, "features": feats})

    return df.select(id_col, media_col).mapInPandas(
        batches, f"id long, features array<double>"
    )


def resize_images(
    df: DataFrame,
    new_w: int,
    new_h: int,
    media_col: str = "media",
    id_col: str = "id",
) -> DataFrame:
    """Image resize pass (1→1 binary→binary, Arrow-batched): FAKE image
    containers whose payload is a width×height byte raster are
    nearest-neighbor resampled — resized pixel (x', y') reads source
    (x'·w // new_w, y'·h // new_h), the standard NN kernel, pure
    integer indexing so an external oracle can recompute every output
    byte. Non-image kinds pass through untouched (a pipeline resizes
    its images and leaves audio/video alone); an image payload that is
    NOT a raw raster needs a real codec → ``decode_image``'s documented
    NotImplementedError boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for m in pdf[media_col]:
                blob = bytes(m)
                kind, w, h, payload = _parse(blob)
                if KINDS.get(kind) != "image":
                    out.append(blob)
                    continue
                if len(payload) != w * h:  # pragma: no cover - codec path
                    decode_image(blob)  # raises NotImplementedError on-box
                raster = np.frombuffer(payload, dtype=np.uint8).reshape(h, w)
                ys = (np.arange(new_h) * h) // new_h
                xs = (np.arange(new_w) * w) // new_w
                resized = raster[ys][:, xs]
                out.append(pack_fake_media(1, new_w, new_h, resized.tobytes()))
            yield pd.DataFrame({"id": pdf[id_col].values, "media": out})

    return df.select(id_col, media_col).mapInPandas(batches, "id long, media binary")


def payload_byte_sums(
    df: DataFrame, media_col: str = "media", id_col: str = "id"
) -> DataFrame:
    """(id, a, b, byte_sum): header dims + sum of payload byte values
    per blob — the media analog of TeraChecksum's order-insensitive
    content checksum, and the cheap way to value-verify a binary
    transform end to end. Emits the dims alongside so a verify
    aggregate needs ONE decode pass, not a decode_meta join (each extra
    consumer of an unpersisted transform re-evaluates its subtree)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            a_s, b_s, sums = [], [], []
            for m in pdf[media_col]:
                _, a, b, payload = _parse(bytes(m))
                a_s.append(a)
                b_s.append(b)
                sums.append(
                    int(np.frombuffer(payload, dtype=np.uint8).sum()) if payload else 0
                )
            yield pd.DataFrame(
                {"id": pdf[id_col].values, "a": a_s, "b": b_s, "byte_sum": sums}
            )

    return df.select(id_col, media_col).mapInPandas(
        batches, "id long, a int, b int, byte_sum long"
    )


def sample_frames(
    df: DataFrame,
    every_n: int,
    media_col: str = "media",
    id_col: str = "id",
) -> DataFrame:
    """Video frame sampling: emits one row PER SAMPLED FRAME (1→N,
    the explode-shaped mapInPandas). For kind=video containers,
    payload = n_frames × frame_bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frame_idx, frames = [], [], []
            for id_, m in zip(pdf[id_col], pdf[media_col]):
                kind, n_frames, frame_bytes, payload = _parse(bytes(m))
                if KINDS.get(kind) != "video" or frame_bytes == 0:
                    continue
                for i in range(0, n_frames, every_n):
                    ids.append(id_)
                    frame_idx.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"id": ids, "frame_idx": frame_idx, "frame": frames})

    return df.select(id_col, media_col).mapInPandas(
        batches, "id long, frame_idx int, frame binary"
    )
