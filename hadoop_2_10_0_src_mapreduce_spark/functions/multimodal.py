"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed via Arrow-batched mapInPandas.

Extension beyond the reference (Hadoop MR had BytesWritable and nothing
else for media). The Spark-side design is the real deliverable here:

- media rows are (id, kind, media: binary, meta: struct) — the binary
  never explodes into Python objects row-by-row; mapInPandas sees
  whole Arrow batches.
- decode/resize/feature-extract run per batch; the codec boundary is
  explicit and (since r8) SMALLER: binary PPM/PGM and uncompressed
  24-bit BMP decode ON-BOX with pure-numpy codecs (``decode_ppm`` /
  ``decode_bmp`` — uncompressed formats are just header parsing), so
  ``decode_image`` is a real end-to-end path for them; compressed
  formats (JPEG/PNG/ffmpeg/torchaudio territory) still try PIL and
  raise NotImplementedError when absent, while the deterministic FAKE
  container format below exercises every seam (schema, batching,
  partitioning, UDF signatures) end-to-end in tests.

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


def _media_dims(blob: bytes) -> tuple[str, int, int, int]:
    """(kind, a, b, payload_len) from any supported container: FAKE
    headers, PPM/PGM, or BMP (header-only reads for all three — the
    raster is never touched); anything else is ('unknown', 0, 0,
    len)."""
    if blob[:4] == MAGIC:
        kind, a, b, payload = _parse(blob)
        return KINDS.get(kind, "unknown"), a, b, len(payload)
    if blob[:2] in (b"P6", b"P5"):
        vals, i = [], 2
        while len(vals) < 2:
            c = blob[i:i + 1]
            if c.isspace():
                i += 1
            elif c == b"#":
                i = blob.index(b"\n", i) + 1
            elif c.isdigit():
                j = i
                while blob[j:j + 1].isdigit():
                    j += 1
                vals.append(int(blob[i:j]))
                i = j
            else:
                return "unknown", 0, 0, len(blob)
        return "image", vals[0], vals[1], len(blob)
    if blob[:2] == b"BM" and len(blob) >= 26:
        w = _struct.unpack("<i", blob[18:22])[0]
        h = abs(_struct.unpack("<i", blob[22:26])[0])
        return "image", w, h, len(blob)
    return "unknown", 0, 0, len(blob)


def decode_meta(df: DataFrame, media_col: str = "media", id_col: str = "id") -> DataFrame:
    """Parse container headers → typed metadata, batch-at-a-time.
    (The 'cheap pass': header-only reads, payload untouched.) Reads
    FAKE containers AND the r8 real formats (PPM/PGM/BMP dims from
    their headers); unrecognized blobs report kind='unknown' instead
    of failing the batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [_media_dims(bytes(m)) for m in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "kind": [k for k, _, _, _ in parsed],
                    "a": [a for _, a, _, _ in parsed],
                    "b": [b for _, _, b, _ in parsed],
                    "payload_len": [n for _, _, _, n in parsed],
                }
            )

    return df.select(id_col, media_col).mapInPandas(batches, META_SCHEMA)


def decode_ppm(blob: bytes) -> np.ndarray:
    """Pure-numpy decode of binary PPM (P6 → (h, w, 3) uint8) and PGM
    (P5 → (h, w) uint8) — a REAL on-box decode path (r8): netpbm is
    uncompressed, so ~30 lines of header parsing is the whole codec.
    Header tokens may be separated by arbitrary whitespace and ``#``
    comments; exactly one whitespace byte precedes the raster
    (the spec). 16-bit rasters (maxval > 255) raise
    NotImplementedError — same boundary convention as compressed
    formats."""
    magic = blob[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    vals: list[int] = []
    i = 2
    while len(vals) < 3:
        c = blob[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            i = blob.index(b"\n", i) + 1
        elif c.isdigit():
            j = i
            while blob[j:j + 1].isdigit():
                j += 1
            vals.append(int(blob[i:j]))
            i = j
        else:
            raise ValueError("bad PPM header")
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM/PGM rasters not supported")
    i += 1  # the single whitespace byte before the raster
    ch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(blob, np.uint8, count=w * h * ch, offset=i)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w) uint8 → P5, (h, w, 3) uint8 → P6 — the inverse of
    ``decode_ppm`` (byte-exact round trip, pinned by test)."""
    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"encode_ppm: unsupported shape {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_bmp(blob: bytes) -> np.ndarray:
    """Pure-numpy decode of uncompressed 24-bit BI_RGB BMP →
    (h, w, 3) uint8 RGB: 14-byte file header (pixel offset), ≥40-byte
    info header (little-endian dims; positive height = bottom-up
    rows), 4-byte-aligned row stride, BGR channel order. Compressed
    or paletted BMPs raise NotImplementedError (the codec
    boundary)."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    off = _struct.unpack("<I", blob[10:14])[0]
    w = _struct.unpack("<i", blob[18:22])[0]
    h_raw = _struct.unpack("<i", blob[22:26])[0]
    bpp = _struct.unpack("<H", blob[28:30])[0]
    comp = _struct.unpack("<I", blob[30:34])[0]
    if comp != 0 or bpp != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit BI_RGB BMP supported "
            f"(got bpp={bpp}, compression={comp})"
        )
    bottom_up, h = h_raw > 0, abs(h_raw)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        blob, np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


def decode_image(blob: bytes) -> np.ndarray:
    """REAL image decode → uint8 array — the codec boundary, shrunk in
    r8: FAKE-container rasters, binary PPM/PGM, and uncompressed
    24-bit BMP decode ON-BOX with the pure-numpy codecs above;
    anything else (JPEG/PNG/…) needs PIL and raises
    NotImplementedError when absent (this container has no image
    libs)."""
    if blob[:4] == MAGIC:
        kind, w, h, payload = _parse(blob)
        if KINDS.get(kind) == "image" and len(payload) == w * h:
            return np.frombuffer(payload, dtype=np.uint8).reshape(h, w)
    if blob[:2] in (b"P6", b"P5"):
        return decode_ppm(blob)
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    try:
        import io

        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL absent on-box
        raise NotImplementedError(
            "compressed-format decoding requires PIL; install pillow on "
            "the cluster, or supply PPM/PGM/uncompressed-BMP (decoded "
            "on-box) or the FAKE-container test path"
        ) from e
    return np.asarray(Image.open(io.BytesIO(blob)))  # pragma: no cover


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
    NOT a raw raster — and any non-container blob — goes through
    ``decode_image``: PPM/PGM/uncompressed-BMP decode on-box (r8) and
    re-encode as netpbm (P6/P5 — the format the pure codec can write);
    compressed formats keep the documented NotImplementedError
    boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for m in pdf[media_col]:
                blob = bytes(m)
                if blob[:4] == MAGIC:
                    kind, w, h, payload = _parse(blob)
                    if KINDS.get(kind) != "image":
                        out.append(blob)
                        continue
                    if len(payload) == w * h:
                        raster = np.frombuffer(
                            payload, dtype=np.uint8
                        ).reshape(h, w)
                        out.append(pack_fake_media(
                            1, new_w, new_h,
                            _nn_resize(raster, new_w, new_h).tobytes(),
                        ))
                        continue
                # real formats: decode (PPM/PGM/BMP on-box; else the
                # codec boundary raises), resize, publish as netpbm
                out.append(
                    encode_ppm(_nn_resize(decode_image(blob), new_w, new_h))
                )
            yield pd.DataFrame({"id": pdf[id_col].values, "media": out})

    return df.select(id_col, media_col).mapInPandas(batches, "id long, media binary")


def _nn_resize(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample — pixel (x', y') reads source
    (x'·w // new_w, y'·h // new_h); pure integer indexing, so an
    external oracle recomputes every output byte. Works for (h, w)
    and (h, w, 3)."""
    h, w = arr.shape[:2]
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return arr[ys][:, xs]


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
