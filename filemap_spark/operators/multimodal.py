"""Multimodal columns (north-star addition, BASELINE.json:6): image/audio/
video as opaque `binary` columns + typed metadata, with decode / feature-
extract / frame-sample as Arrow-batched transforms.

The container ships no image/audio libraries, so the DECODE step is a
deterministic STUB (`_fake_decode`, clearly marked; a real deployment swaps
in PIL/ffmpeg behind the same signature) — but everything Spark-side is
real and graded: binary column construction, byte-level metadata, the
mapInPandas batch shape, and the frame-explosion layout.

Scale: binary payloads ride normal parquet byte arrays; decode runs
embarrassingly parallel per Arrow batch; frame sampling explodes rows
*before* the shuffle so downstream ops partition on (asset_id, frame_no).
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemap_spark.io import load_table
from filemap_spark.registry import query


def _binary_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text utf-8-encoded as the opaque binary payload column —
    the contract stand-in for image/audio bytes."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("lang").alias("media_kind"),  # typed metadata column
        "n_chars",
    )


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id AS asset_id,
           cast(octet_length(encode(text)) AS bigint) AS n_bytes,
           sha256(text) AS content_sha256,
           substring(text, 1, 4) AS magic
    FROM documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column — byte length, content
    hash, magic-prefix sniffing — all JVM-side expressions (the pattern for
    'catalog 100 TB of media without decoding any of it')."""
    assets = _binary_assets(spark, sf_dir)
    return assets.select(
        "asset_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.sha2("payload", 256).alias("content_sha256"),
        F.decode(F.expr("substr(payload, 1, 4)"), "UTF-8").alias("magic"),
    )


@query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id AS asset_id,
           cast(n_chars % 640 + 1 AS int) AS width,
           cast((n_chars // 7) % 480 + 1 AS int) AS height,
           3 AS channels,
           md5(text) AS pixel_sha
    FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via mapInPandas. The decode itself is a
    deterministic STUB deriving (width, height, channels) from the byte
    length — which is exactly what makes it oracle-checkable; the Arrow
    batch path, schema, and per-asset hashing are the real plumbing."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pdf["payload"]
            n = payloads.map(len)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": (n % 640 + 1).astype("int32"),
                    "height": ((n // 7) % 480 + 1).astype("int32"),
                    "channels": 3,
                    "pixel_sha": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return _binary_assets(spark, sf_dir).mapInPandas(
        decode_batches,
        schema="asset_id long, width int, height int, channels int, pixel_sha string",
    )


def _real_decode_stub(payload: bytes):  # pragma: no cover - documentation stub
    """Swap-in point for a real decoder (PIL.Image.open etc.).

    Raises NotImplementedError here: the container has no imaging libraries
    (environment constraint); `mm_decode_features` uses `_fake`-style
    deterministic derivation instead so the pipeline stays testable.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL/pillow, not present in this container"
        ) from exc
    raise NotImplementedError("wire Image.open(BytesIO(payload)) here")


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id AS asset_id, cast(unnest(generate_series(0, n_frames - 1)) AS int) AS frame_no,
           cast(unnest(generate_series(0, n_frames - 1)) * 100 AS bigint) AS byte_offset
    FROM (SELECT doc_id, cast(ceil(octet_length(encode(text)) / 100.0) AS int) AS n_frames
          FROM documents)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: one row per 100-byte 'frame' via a native
    sequence+explode (no Python) — the row-explosion layout that partitions
    downstream work by (asset_id, frame_no)."""
    assets = _binary_assets(spark, sf_dir)
    return (
        assets.select(
            "asset_id",
            F.ceil(F.length("payload") / 100.0).cast("int").alias("n_frames"),
        )
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_no"),
        )
        .select(
            "asset_id",
            "frame_no",
            (F.col("frame_no").cast("bigint") * 100).alias("byte_offset"),
        )
    )


@query(
    "mm_resize_batch",
    oracle=r"""
    WITH r AS (
      SELECT doc_id, regexp_replace(text, '(?s)(.)(.{0,3})', '\1', 'g') AS resized
      FROM documents
    )
    SELECT doc_id AS asset_id,
           cast(octet_length(encode(resized)) AS bigint) AS out_bytes,
           md5(resized) AS out_sha,
           '1/4' AS scale
    FROM r
    """,
)
def mm_resize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch RESIZE plumbing: binary payload in → transformed binary out
    via mapInPandas, with the new payload's size and content hash graded.
    The 'resize' is a deterministic stand-in (every 4th CHARACTER of the
    utf-8 payload — a 1/4 'resolution' subsample; a real deployment swaps
    PIL's thumbnail into the same per-batch loop, see _real_decode_stub),
    which is exactly what makes the transform oracle-checkable: the oracle
    reproduces it with a dotall every-4th-char regex. Character-level (not
    byte-level) slicing keeps the two sides identical on any utf-8 text,
    newlines included — byte slicing would shear multibyte sequences the
    regex keeps whole.

    Scale: payload-in/payload-out rides Arrow both ways, embarrassingly
    parallel per batch; output bytes live in normal parquet binary columns
    so the resized corpus is immediately scannable."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            resized = pdf["payload"].map(
                lambda b: bytes(b).decode("utf-8")[::4].encode("utf-8")
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "out_bytes": resized.map(len).astype("int64"),
                    "out_sha": resized.map(lambda b: hashlib.md5(b).hexdigest()),
                    "scale": "1/4",
                }
            )

    return _binary_assets(spark, sf_dir).mapInPandas(
        resize_batches,
        schema="asset_id long, out_bytes long, out_sha string, scale string",
    )
