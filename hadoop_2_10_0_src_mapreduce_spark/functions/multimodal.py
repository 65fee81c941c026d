"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed via Arrow-batched mapInPandas.

Extension beyond the reference (Hadoop MR had BytesWritable and nothing
else for media). The Spark-side design is the real deliverable here:

- media rows are (id, kind, media: binary, meta: struct) — the binary
  never explodes into Python objects row-by-row; mapInPandas sees
  whole Arrow batches.
- decode/resize/feature-extract run per batch; the codec boundary is
  explicit and (since r8) SMALLER: binary PPM/PGM, uncompressed
  24-bit BMP, AND 8-bit non-interlaced PNG decode ON-BOX with
  pure-numpy codecs (``decode_ppm`` / ``decode_bmp`` /
  ``decode_png`` — the PNG DEFLATE stream is stdlib zlib, the five
  scanline filters unfilter in numpy), so ``decode_image`` is a real
  end-to-end path for them; the remaining compressed formats
  (JPEG/video — ffmpeg/torchaudio territory) still try PIL and
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
import zlib
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


def _netpbm_header(blob: bytes, n_vals: int) -> tuple[list[int], int]:
    """Shared netpbm header tokenizer (the one automaton both the
    cheap metadata pass and the real decoder use, so they can never
    disagree on a blob): parse ``n_vals`` ints after the magic,
    skipping arbitrary whitespace and ``#`` comments. Returns (vals,
    offset-just-past-the-last-digit). Raises ValueError on malformed
    headers (incl. a comment with no terminating newline, and a magic
    with no delimiter after it — b'P6123 45' must not silently parse
    width=123; the spec requires whitespace/comment after the magic,
    ADVICE r9)."""
    if not (blob[2:3].isspace() or blob[2:3] == b"#"):
        raise ValueError("bad netpbm header: no delimiter after magic")
    vals: list[int] = []
    i = 2
    while len(vals) < n_vals:
        c = blob[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            nl = blob.find(b"\n", i)
            if nl < 0:
                raise ValueError("unterminated netpbm comment")
            i = nl + 1
        elif c.isdigit():
            j = i
            while blob[j:j + 1].isdigit():
                j += 1
            vals.append(int(blob[i:j]))
            i = j
        else:
            raise ValueError("bad netpbm header")
    return vals, i


def _media_dims(blob: bytes) -> tuple[str, int, int, int]:
    """(kind, a, b, payload_len) from any supported container: FAKE
    headers, PPM/PGM, BMP, or PNG (header-only reads for all four —
    the raster is never touched); anything else — INCLUDING truncated
    or malformed headers — is ('unknown', 0, 0, len), never an
    exception (one bad row must not fail its whole Arrow batch)."""
    try:
        if blob[:4] == MAGIC:
            kind, a, b, payload = _parse(blob)
            return KINDS.get(kind, "unknown"), a, b, len(payload)
        if blob[:2] in (b"P6", b"P5"):
            (w, h), _ = _netpbm_header(blob, 2)
            return "image", w, h, len(blob)
        if blob[:2] == b"BM" and len(blob) >= 26:
            w = _struct.unpack("<i", blob[18:22])[0]
            h = abs(_struct.unpack("<i", blob[22:26])[0])
            return "image", w, h, len(blob)
        if blob[:8] == _PNG_SIG and len(blob) >= 24:
            w, h = _struct.unpack(">II", blob[16:24])
            return "image", w, h, len(blob)
    except (ValueError, _struct.error):
        pass
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
    (w, h, maxval), i = _netpbm_header(blob, 3)
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth_row(row: np.ndarray, prev: np.ndarray, bpp: int) -> None:
    """In-place Paeth unfilter of one row (recon semantics: ``row``
    holds raw filter bytes on entry, reconstructed bytes on exit).
    Vectorized across the ``bpp`` byte lanes per step — O(w) Python
    steps instead of O(w·bpp)."""
    r = row.astype(np.int64)
    p = prev.astype(np.int64)
    n = len(row)
    a = np.zeros(bpp, np.int64)  # recon[i-bpp] for the current step
    c = np.zeros(bpp, np.int64)  # prev [i-bpp]
    for i in range(0, n, bpp):
        sl = slice(i, min(i + bpp, n))
        b = p[sl]
        cc = c[: sl.stop - sl.start]
        aa = a[: sl.stop - sl.start]
        q = aa + b - cc
        pa, pb, pc = np.abs(q - aa), np.abs(q - b), np.abs(q - cc)
        pred = np.where(
            (pa <= pb) & (pa <= pc), aa, np.where(pb <= pc, b, cc)
        )
        r[sl] = (r[sl] + pred) & 0xFF
        a = r[sl]
        c = b
    row[:] = r.astype(np.uint8)


def decode_png(blob: bytes) -> np.ndarray:
    """Pure-numpy + stdlib-zlib PNG decode — 8-bit non-interlaced
    gray / gray+alpha / RGB / RGBA / palette → uint8 array of shape
    (h, w[, channels]). The DEFLATE stream is stdlib ``zlib``; the five
    scanline filters unfilter with numpy (None/Up fully vectorized,
    Sub via per-lane cumsum mod 256, Average/Paeth per-row with
    lane-vectorized steps — correctness-first; our ``encode_png``
    emits filter 0 so round trips never hit the slow paths).
    16-bit, interlaced (Adam7), sub-byte-depth, and tRNS-transparent
    images raise NotImplementedError — the codec boundary, same
    convention as compressed BMP."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while pos < len(blob):
        ln = _struct.unpack(">I", blob[pos:pos + 4])[0]
        tag = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = _struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            raise NotImplementedError("PNG tRNS transparency not supported")
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG supported "
            f"(depth={depth}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"bad PNG color type {ctype}")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    rowbytes = w * channels
    if len(raw) != h * (rowbytes + 1):
        raise ValueError("PNG raster size mismatch")
    raw = raw.reshape(h, rowbytes + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.empty((h, rowbytes), np.uint8)
    zero = np.zeros(rowbytes, np.uint8)
    for y in range(h):
        f, row = filters[y], rows[y].copy()
        prev = out[y - 1] if y else zero
        if f == 0:
            pass
        elif f == 1:  # Sub: per-lane cumsum mod 256
            row = (
                np.cumsum(
                    row.reshape(-1, channels).astype(np.int64), axis=0
                )
                % 256
            ).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            row += prev
        elif f == 3:  # Average
            r = row.astype(np.int64)
            p = prev.astype(np.int64)
            a = np.zeros(channels, np.int64)
            for i in range(0, rowbytes, channels):
                sl = slice(i, min(i + channels, rowbytes))
                r[sl] = (r[sl] + (a[: sl.stop - sl.start] + p[sl]) // 2) & 0xFF
                a = r[sl]
            row = r.astype(np.uint8)
        elif f == 4:
            _paeth_row(row, prev, channels)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = row
    if ctype == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        return plte[out.reshape(h, w)]
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w) / (h, w, 3) / (h, w, 4) → PNG bytes (filter 0
    scanlines, one zlib IDAT) — the inverse of ``decode_png``
    (byte-exact raster round trip, pinned by test)."""
    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if arr.ndim == 2:
        ctype, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        ctype, channels = (2, 3) if arr.shape[2] == 3 else (6, 4)
    else:
        raise ValueError(f"encode_png: unsupported shape {arr.shape}")
    h, w = arr.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + tag
            + data
            + _struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raster = np.empty((h, w * channels + 1), np.uint8)
    raster[:, 0] = 0
    raster[:, 1:] = arr.reshape(h, w * channels)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster.tobytes()))
        + chunk(b"IEND", b"")
    )


def decode_image(blob: bytes) -> np.ndarray:
    """REAL image decode → uint8 array — the codec boundary, shrunk in
    r8: FAKE-container rasters, binary PPM/PGM, uncompressed 24-bit
    BMP, and 8-bit non-interlaced PNG decode ON-BOX with the
    pure-numpy codecs above; anything else (JPEG/video/…) needs PIL
    and raises NotImplementedError when absent (this container has no
    image libs)."""
    if blob[:4] == MAGIC:
        kind, w, h, payload = _parse(blob)
        if KINDS.get(kind) == "image" and len(payload) == w * h:
            return np.frombuffer(payload, dtype=np.uint8).reshape(h, w)
    if blob[:2] in (b"P6", b"P5"):
        return decode_ppm(blob)
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:8] == _PNG_SIG:
        return decode_png(blob)
    try:
        import io

        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL absent on-box
        raise NotImplementedError(
            "compressed-format decoding requires PIL; install pillow on "
            "the cluster, or supply PPM/PGM/uncompressed-BMP/8-bit-PNG "
            "(decoded on-box) or the FAKE-container test path"
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
    ``decode_image``: PPM/PGM/uncompressed-BMP/8-bit-PNG decode
    on-box (r8) and re-encode as netpbm (P6/P5 — the canonical
    pure-codec output; gray/RGB PNG inputs therefore come back as
    netpbm, while alpha-bearing PNGs re-encode as PNG since netpbm
    can't carry alpha); the remaining compressed formats keep the
    documented NotImplementedError boundary."""

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
                    if len(payload) != w * h:
                        # a corrupt FAKE container must NOT fall
                        # through to decode_image — with pillow
                        # installed PIL would raise its own
                        # UnidentifiedImageError on the FAKE bytes,
                        # breaking the documented codec-boundary
                        # contract (ADVICE r9)
                        raise ValueError(
                            f"FAKE image payload length {len(payload)} "
                            f"!= w*h = {w * h} — corrupt container"
                        )
                    raster = np.frombuffer(
                        payload, dtype=np.uint8
                    ).reshape(h, w)
                    out.append(pack_fake_media(
                        1, new_w, new_h,
                        _nn_resize(raster, new_w, new_h).tobytes(),
                    ))
                    continue
                # real formats: decode (PPM/PGM/BMP/PNG on-box; else
                # the codec boundary raises), resize, publish as
                # netpbm — except alpha-bearing rasters (PNG RGBA /
                # gray+alpha), which netpbm can't carry: those
                # re-encode as PNG
                arr = _nn_resize(decode_image(blob), new_w, new_h)
                if arr.ndim == 3 and arr.shape[2] in (2, 4):
                    if arr.shape[2] == 2:  # gray+alpha: split channels
                        ga = np.stack(
                            [arr[..., 0]] * 3 + [arr[..., 1]], axis=-1
                        )
                        out.append(encode_png(ga))
                    else:
                        out.append(encode_png(arr))
                else:
                    out.append(encode_ppm(arr))
            yield pd.DataFrame({"id": pdf[id_col].values, "media": out})

    return df.select(id_col, media_col).mapInPandas(batches, "id long, media binary")


def _nn_resize(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample — pixel (x', y') reads source
    (x'·w // new_w, y'·h // new_h); pure integer indexing, so an
    external oracle recomputes every output byte. Works for (h, w)
    and (h, w, channels)."""
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
