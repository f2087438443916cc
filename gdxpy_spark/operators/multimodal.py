"""Multimodal columns (north star): image/audio/video as opaque BINARY
columns with typed metadata, processed by Arrow-batched Pandas UDFs over
mapInPandas.

The container ships no image/audio codecs (PIL/av absent), so the *byte
decode* is a deterministic fake — a 16-byte header (magic, format, width,
height, fps) followed by payload — while everything Spark-cares-about is
real and tested: the binary column schema, the mapInPandas batch
iteration (pandas bytes in, DataFrame out), output schemas, partition
behavior, and the per-frame fan-out. `decode_real` marks exactly where a
production deployment swaps in PIL/libav (NotImplementedError behind an
import-try).

The fake "media" bytes are synthesized from `documents` (header fields
derived from doc_id/n_chars), which makes mm_image_meta and
mm_frame_sample *oracle-checkable*: DuckDB recomputes the expected
metadata from the same columns without touching bytes — so the test
proves the bytes really were written, shipped through Arrow, and parsed
back per batch.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from gdxpy_spark.registry import register
from gdxpy_spark.tables import table

_MAGIC = b"GXMM"
_FORMATS = ("png", "jpeg", "webp")


def decode_real(payload: bytes, fmt: str):
    """Production decode hook — requires PIL/libav, absent here (STUB)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            "real image/video decode needs PIL/libav, not in this container;"
            " the deterministic header decode below exercises the Spark"
            " plumbing instead"
        ) from exc


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media BINARY, media_type STRING): a 16-byte
    header (magic | fmt u8 | width u32 | height u32 | fps u8 | pad) +
    the utf-8 text as payload. Header fields are pure functions of
    doc_id/n_chars so oracles can recompute them."""
    docs = table(spark, sf_dir, "documents")
    fmt_idx = (F.col("doc_id") % 3).cast("int")
    width = (F.col("n_chars") % 640 + 64).cast("int")
    height = (F.col("doc_id") % 480 + 48).cast("int")
    fps = (F.col("doc_id") % 30 + 1).cast("int")

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for _, r in pdf.iterrows():
                header = (
                    _MAGIC
                    + struct.pack("<BIIB", int(r.fmt_idx), int(r.width), int(r.height), int(r.fps))
                    + b"\x00\x00"
                )
                blobs.append(header + r.text.encode("utf-8"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf.doc_id,
                    "media": blobs,
                    "media_type": [
                        _FORMATS[int(i)] for i in pdf.fmt_idx
                    ],
                }
            )

    src = docs.select(
        "doc_id", "text",
        fmt_idx.alias("fmt_idx"), width.alias("width"),
        height.alias("height"), fps.alias("fps"),
    )
    return src.mapInPandas(
        build, schema="doc_id BIGINT, media BINARY, media_type STRING"
    )


@register(
    "mm_image_meta",
    oracle="""
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
            ELSE 'webp' END AS media_type,
       CAST(n_chars % 640 + 64 AS INT) AS width,
       CAST(doc_id % 480 + 48 AS INT) AS height,
       CAST(n_chars AS BIGINT) AS payload_bytes
FROM documents
""",
    category="MM",
)
def mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode typed metadata out of a binary media column with an
    Arrow-batched mapInPandas header parse. The oracle recomputes the
    expected fields from the source columns — proving the bytes
    round-tripped through the binary column and the Python worker. At
    100 TB this stage is a map-only pass; binary payloads never shuffle."""
    media = media_table(spark, sf_dir)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r.media)
                assert blob[:4] == _MAGIC, "bad media header"
                fmt_i, width, height, _fps = struct.unpack("<BIIB", blob[4:14])
                rows.append(
                    (int(r.doc_id), _FORMATS[fmt_i], width, height, len(blob) - 16)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_type", "width", "height", "payload_bytes"]
            )

    return media.mapInPandas(
        parse,
        schema="doc_id BIGINT, media_type STRING, width INT, height INT,"
        " payload_bytes BIGINT",
    )


@register(
    "mm_frame_sample",
    oracle="""
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       CAST((i - 1) * (doc_id % 30 + 1) AS BIGINT) AS frame_offset
FROM documents
CROSS JOIN generate_series(1, 3) AS t(i)
WHERE doc_id % 30 + 1 >= 3
""",
    category="MM",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling as a per-row fan-out: treat the media column as a
    'video' whose fps comes from the header; emit the first 3 frame
    offsets (frame k starts at k·fps in this fake container). The
    mapInPandas batch emits a variable number of output rows per input
    row — the exact shape of a real ffmpeg frame sampler, minus the
    codec. Videos shorter than 3 'frames' are skipped."""
    media = media_table(spark, sf_dir)

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                blob = bytes(r.media)
                fps = struct.unpack("<B", blob[13:14])[0]
                if fps < 3:
                    continue
                for k in range(3):
                    out.append((int(r.doc_id), k + 1, k * fps))
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "frame_offset"]
            )

    return media.mapInPandas(
        sample, schema="doc_id BIGINT, frame_idx INT, frame_offset BIGINT"
    )


@register("mm_feature_extract", oracle=None, category="MM")  # weak: vector output
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction: binary payload → 8-dim float vector (byte-
    histogram moments over 8 equal-width bins — deterministic, so the
    rows-only check is reproducible; a real deployment swaps the inner
    loop for a vision encoder via decode_real). The vector lands in the
    same array<float> shape as the embeddings table, ready for the
    llm_knn_topk / llm_cosine_pairs operators downstream."""
    import numpy as np

    media = media_table(spark, sf_dir)

    def features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, vecs = [], []
            for _, r in pdf.iterrows():
                payload = np.frombuffer(bytes(r.media)[16:], dtype=np.uint8)
                hist, _ = np.histogram(payload, bins=8, range=(0, 256))
                total = max(1, int(hist.sum()))
                ids.append(int(r.doc_id))
                vecs.append((hist / total).astype("float32").tolist())
            yield pd.DataFrame({"doc_id": ids, "feature": vecs})

    return media.mapInPandas(features, schema="doc_id BIGINT, feature ARRAY<FLOAT>")
