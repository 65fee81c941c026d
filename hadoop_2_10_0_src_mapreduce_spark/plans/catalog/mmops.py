"""Catalog: multimodal-column queries (binary media + typed metadata).

The container has no image/audio codecs, so media blobs are synthesized
DETERMINISTICALLY from the documents table (kind/dims from doc_id and
n_chars, payload = UTF-8 text bytes) with the FAKE container format from
``functions.multimodal``. Because the synthesis is pure arithmetic on
fixture columns, the post-decode aggregates are SQL-expressible and the
DuckDB oracle checks the whole pack→decode→aggregate pipeline exactly —
the decode plumbing (binary columns through Arrow batches, header
parsing, 1→N frame explosion) is the part under test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.functions import multimodal as mm
from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import load_table

_FRAME_BYTES = 4


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (id, media binary): kind = doc_id%3+1, a = n_chars
    mod 2^16, b = doc_id*7 mod 2^16, payload = utf-8 text bytes."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = [
                mm.pack_fake_media(
                    int(doc_id) % 3 + 1,
                    int(n_chars) % 65536,
                    (int(doc_id) * 7) % 65536,
                    str(text).encode("utf-8"),
                )
                for doc_id, text, n_chars in zip(
                    pdf["doc_id"], pdf["text"], pdf["n_chars"]
                )
            ]
            yield pd.DataFrame({"id": pdf["doc_id"].values, "media": media})

    return docs.mapInPandas(batches, "id long, media binary")


def synth_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with doc_id%3==2 → video containers: n_frames =
    5 + doc_id%10, frame_bytes = 4, payload = n_frames*4 zero bytes."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") % 3 == 2
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = [
                mm.pack_fake_media(
                    3, 5 + int(d) % 10, _FRAME_BYTES,
                    b"\x00" * ((5 + int(d) % 10) * _FRAME_BYTES),
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"id": pdf["doc_id"].values, "media": media})

    return docs.mapInPandas(batches, "id long, media binary")


# --- header decode + frame sampling + resize (one checked query) -------
# Three §2-extension components in one result (merged to fit the
# driver's 50-checked-query window): the 'decode' section is the cheap
# metadata pass (decode_meta via Arrow-batched mapInPandas, per-kind
# aggregate); the 'frames' section is the 1→N explode-shaped decode
# (every-2nd frame sampling over binary video payloads); the 'resize'
# section runs the nearest-neighbor resize kernel over synthetic
# rasters and checksums the OUTPUT BYTES — resized pixel (x', y') reads
# source index (y'·h//H)·w + x'·w//W, and raster byte i = i % 251, so
# the oracle recomputes every resized byte arithmetically (a wrong
# index anywhere changes sum_payload). Frames-row column mapping: n =
# videos, sum_a = frames sampled, sum_b = sum of sampled frame indices
# (m = ceil(n_frames/2) at stride 2 → per-video sum m*(m-1)),
# sum_payload = 0. Resize-row: n = images, sum_a/sum_b = output dims
# summed, sum_payload = resized byte checksum.

_RESIZE_W, _RESIZE_H = 8, 6


def _resize_oracle_section() -> str:
    w, h = "(4 + d.doc_id % 13)", "(3 + d.doc_id % 11)"
    return f"""
    SELECT 'resize' AS section, 'image' AS kind,
           COUNT(*) AS n,
           CAST(COUNT(*) * {_RESIZE_W} AS BIGINT) AS sum_a,
           CAST(COUNT(*) * {_RESIZE_H} AS BIGINT) AS sum_b,
           CAST(SUM((SELECT SUM(((y.y * {h}) // {_RESIZE_H} * {w}
                                 + (x.x * {w}) // {_RESIZE_W}) % 251)
                     FROM range({_RESIZE_H}) y(y), range({_RESIZE_W}) x(x)))
               AS BIGINT) AS sum_payload
    FROM documents d WHERE d.doc_id % 3 = 0
"""


_DECODE_FRAMES_ORACLE = f"""
SELECT section, kind, n, sum_a, sum_b, sum_payload FROM (
    SELECT 'decode' AS section,
           CASE doc_id % 3 + 1 WHEN 1 THEN 'image' WHEN 2 THEN 'audio'
           ELSE 'video' END AS kind,
           COUNT(*) AS n,
           CAST(SUM(n_chars % 65536) AS BIGINT) AS sum_a,
           CAST(SUM(doc_id * 7 % 65536) AS BIGINT) AS sum_b,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_payload
    FROM documents
    GROUP BY kind
    UNION ALL
    SELECT 'frames' AS section, 'video' AS kind,
           COUNT(*) AS n,
           CAST(SUM((5 + doc_id % 10 + 1) // 2) AS BIGINT) AS sum_a,
           CAST(SUM(((5 + doc_id % 10 + 1) // 2) * ((5 + doc_id % 10 + 1) // 2 - 1))
               AS BIGINT) AS sum_b,
           CAST(0 AS BIGINT) AS sum_payload
    FROM documents
    WHERE doc_id % 3 = 2
    UNION ALL
{_resize_oracle_section()}
)
ORDER BY section, kind
"""


def synth_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with doc_id%3==0 → image containers whose payload IS a
    w×h raster: w = 4 + doc_id%13, h = 3 + doc_id%11, byte i = i % 251
    (prime modulus so no resize grid aligns with the pattern)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") % 3 == 0
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            media = []
            for d in pdf["doc_id"]:
                w, h = 4 + int(d) % 13, 3 + int(d) % 11
                raster = (np.arange(w * h, dtype=np.int64) % 251).astype(np.uint8)
                media.append(mm.pack_fake_media(1, w, h, raster.tobytes()))
            yield pd.DataFrame({"id": pdf["doc_id"].values, "media": media})

    return docs.mapInPandas(batches, "id long, media binary")


@register("mm_decode_frames", _DECODE_FRAMES_ORACLE, tags=("multimodal",),
          doc="Multimodal header decode (Arrow-batched mapInPandas, per-kind aggregate) + video frame sampling (1→N mapInPandas explode, every 2nd frame) + nearest-neighbor image resize (binary→binary, output bytes checksummed), unioned under a section column; oracle recomputes all three from the source columns.")
def mm_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = mm.decode_meta(synth_media(spark, sf_dir))
    decode = (
        meta.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a").alias("sum_a"),
            F.sum("b").alias("sum_b"),
            F.sum("payload_len").alias("sum_payload"),
        )
        .select(F.lit("decode").alias("section"), "kind", "n", "sum_a", "sum_b", "sum_payload")
    )
    frames = mm.sample_frames(synth_videos(spark, sf_dir), every_n=2)
    frame_agg = frames.agg(
        F.countDistinct("id").alias("n"),
        F.count(F.lit(1)).alias("sum_a"),
        F.sum("frame_idx").alias("sum_b"),
    ).select(
        F.lit("frames").alias("section"),
        F.lit("video").alias("kind"),
        "n", "sum_a", "sum_b",
        F.lit(0).cast("long").alias("sum_payload"),
    )
    resized = mm.resize_images(
        synth_images(spark, sf_dir), _RESIZE_W, _RESIZE_H
    )
    resize_agg = (
        mm.payload_byte_sums(resized)  # one decode pass: dims + checksum
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a").alias("sum_a"),
            F.sum("b").alias("sum_b"),
            F.sum("byte_sum").alias("sum_payload"),
        )
        .select(
            F.lit("resize").alias("section"),
            F.lit("image").alias("kind"),
            "n", "sum_a", "sum_b", "sum_payload",
        )
    )
    return decode.unionByName(frame_agg).unionByName(resize_agg).orderBy(
        "section", "kind"
    )


# --- feature extraction composed into dedup ----------------------------
# sha256-derived features are payload-deterministic, so two media blobs
# share a feature vector iff their payloads are byte-identical — the
# multimodal face of exact dedup. Corpus = documents + planted copies
# (dedupops.corpus_with_dups), so duplicate groups exist by construction.

from hadoop_2_10_0_src_mapreduce_spark.plans.catalog.dedupops import (
    PLANT_OFFSET,
)

_FEATURE_DEDUP_ORACLE = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {PLANT_OFFSET} AS doc_id, text
    FROM documents WHERE doc_id % 10 = 0
),
grps AS (
    SELECT COUNT(*) AS n, MIN(doc_id) AS keeper
    FROM corpus GROUP BY text HAVING COUNT(*) > 1
)
SELECT COUNT(*) AS n_dup_groups,
       CAST(SUM(n) AS BIGINT) AS n_dup_members,
       CAST(SUM(keeper) AS BIGINT) AS sum_keepers
FROM grps
"""


@register("mm_feature_dedup", _FEATURE_DEDUP_ORACLE, tags=("multimodal", "dedup"),
          doc="Multimodal exact dedup: extract_features (sha256 of payload) grouped to find byte-identical media; oracle groups the source text directly.")
def mm_feature_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    copies = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "text", "n_chars"
    )
    corpus = docs.unionByName(copies)

    def batches(it):
        import pandas as pd

        for pdf in it:
            media = [
                mm.pack_fake_media(1, 0, 0, str(t).encode("utf-8"))
                for t in pdf["text"]
            ]
            yield pd.DataFrame({"id": pdf["doc_id"].values, "media": media})

    media_df = corpus.mapInPandas(batches, "id long, media binary")
    feats = mm.extract_features(media_df)
    grps = (
        feats.groupBy("features")
        .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("keeper"))
        .where(F.col("n") > 1)
    )
    return grps.agg(
        F.count(F.lit(1)).alias("n_dup_groups"),
        F.sum("n").alias("n_dup_members"),
        F.sum("keeper").alias("sum_keepers"),
    )
