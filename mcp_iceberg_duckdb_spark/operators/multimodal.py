"""Multimodal column plumbing (tier X — SURVEY.md §2.11): opaque
binary payloads + typed metadata structs, with decode/feature-extract
as Arrow-batched Pandas UDFs over mapInPandas.

The image/audio codec libraries are not in this container, so the
DECODE step is stubbed (deterministic fake derived from the payload
bytes, or NotImplementedError for the real path) — but everything
Spark-side is real and tested: the binary column type, the metadata
struct schema, the mapInPandas batch iteration, the output schema
contract, and partition-preserving execution.

At 100 TB: binary payloads ride through the scan untouched (parquet
binary column chunks), the featurizer is a per-partition Arrow batch
stream (no per-row serde), and nothing ever collects to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from mcp_iceberg_duckdb_spark.operators._util import t
from mcp_iceberg_duckdb_spark.registry import query

REAL_DECODERS_AVAILABLE = False  # PIL / torchaudio / cv2 not in container


def assets_frame(spark, sf_dir) -> DataFrame:
    """The multimodal table: documents re-materialized as (asset_id,
    payload binary, meta struct). In production this is the shape of
    an Iceberg table with a binary column + metadata struct; here the
    payload is the utf-8 document text so it's deterministic."""
    d = t(spark, sf_dir).documents
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("long").alias("n_bytes_claimed"),
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> dict:
    """Real decode path — requires codec libs not present here."""
    raise NotImplementedError(
        "image decode requires PIL/cv2 (not in this container); "
        "use fake_decode for deterministic testing"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a decoder: derives fake media
    properties from the payload's md5, so the Spark-side plumbing
    (schema, batching, partitioning) is exercised with stable
    values."""
    digest = hashlib.md5(payload).digest()
    return {
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "n_frames": 1 + digest[2] % 16,
        "content_hash": digest.hex(),
    }


_FEATURE_SCHEMA = (
    "asset_id long, mime string, n_bytes long, width int, height int, "
    "n_frames int, content_hash string"
)


def _make_featurizer():
    """Build the mapInPandas worker as a self-contained closure:
    cloudpickle serializes locally-defined functions BY VALUE, so
    executors never need this package importable (a module-level
    function would be pickled by import path and break on workers
    without the repo on PYTHONPATH)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _decode(payload: bytes) -> dict:
            digest = _hashlib.md5(bytes(payload)).digest()
            return {
                "width": 64 + digest[0] % 192,
                "height": 64 + digest[1] % 192,
                "n_frames": 1 + digest[2] % 16,
                "content_hash": digest.hex(),
            }

        for pdf in batches:
            decoded = [_decode(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_frames": [d["n_frames"] for d in decoded],
                    "content_hash": [d["content_hash"] for d in decoded],
                }
            )

    return featurize


# The fake decoder is md5-derived, so it IS SQL-expressible: DuckDB
# recomputes the digest bytes from md5(text) hex chars — turning the
# mapInPandas plumbing check from rows-only into a full value oracle.
_MD5_BYTES_CTE = """
    WITH h AS (
        SELECT doc_id, md5(text) AS mh,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    b AS (
        SELECT doc_id, mh, n_bytes,
               (strpos('0123456789abcdef', substr(mh,1,1))-1)*16
             + (strpos('0123456789abcdef', substr(mh,2,1))-1) AS b0,
               (strpos('0123456789abcdef', substr(mh,3,1))-1)*16
             + (strpos('0123456789abcdef', substr(mh,4,1))-1) AS b1,
               (strpos('0123456789abcdef', substr(mh,5,1))-1)*16
             + (strpos('0123456789abcdef', substr(mh,6,1))-1) AS b2
        FROM h
    ),
    f AS (
        SELECT doc_id AS asset_id, 'text/plain' AS mime, n_bytes,
               CAST(64 + b0 % 192 AS INT) AS width,
               CAST(64 + b1 % 192 AS INT) AS height,
               CAST(1 + b2 % 16 AS INT)   AS n_frames,
               mh AS content_hash
        FROM b
    )
"""


@query(
    "x_multimodal_features",
    oracle=_MD5_BYTES_CTE
    + """
    SELECT asset_id, mime, n_bytes, width, height, n_frames, content_hash
    FROM f
    """,
    tags=("multimodal", "tierx"),
)
def x_multimodal_features(spark, sf_dir):
    """Decode/feature-extract over binary assets via mapInPandas:
    Arrow-batched, partition-preserving, no shuffle. The decode is the
    deterministic md5-derived stub (REAL_DECODERS_AVAILABLE gates the
    real one), which the DuckDB oracle recomputes byte-for-byte from
    md5 hex — a full value check of the Arrow round-trip, schema
    contract, and batch iteration."""
    return assets_frame(spark, sf_dir).mapInPandas(
        _make_featurizer(), schema=_FEATURE_SCHEMA
    )


@query(
    "x_multimodal_metadata",
    oracle="""
    SELECT doc_id AS asset_id,
           octet_length(encode(text)) AS payload_bytes,
           'text/plain' AS mime,
           source AS origin
    FROM documents
    """,
    tags=("multimodal", "tierx"),
)
def x_multimodal_metadata(spark, sf_dir):
    """The JVM-side slice of the multimodal surface (oracle-checked):
    binary payload size + metadata struct field access — proves the
    binary column and struct plumbing without touching Python."""
    a = assets_frame(spark, sf_dir)
    return a.select(
        "asset_id",
        F.length("payload").cast("long").alias("payload_bytes"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.origin").alias("origin"),
    )


@query(
    "x_multimodal_frame_sample",
    oracle=_MD5_BYTES_CTE
    + """
    , s AS (
        SELECT asset_id, n_frames,
               list_slice(range(0, n_frames,
                                greatest(n_frames // 4, 1)), 1, 4) AS idxs
        FROM f
    )
    SELECT asset_id, n_frames,
           CAST(i - 1 AS INT) AS sample_ord,
           CAST(idxs[i] AS INT) AS frame_idx
    FROM s, unnest(generate_series(1, len(idxs))) AS u(i)
    """,
    tags=("multimodal", "tierx"),
)
def x_multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing: explode each asset into ≤4 evenly-
    spaced fake frame indices (the shape of video frame extraction —
    one row per sampled frame, frame payload decode stubbed)."""
    feats = x_multimodal_features(spark, sf_dir)
    step = F.greatest((F.col("n_frames") / 4).cast("int"), F.lit(1))
    idxs = F.sequence(F.lit(0), F.col("n_frames") - 1, step)
    return feats.select(
        "asset_id",
        "n_frames",
        F.posexplode(idxs).alias("sample_ord", "frame_idx"),
    ).filter(F.col("sample_ord") < 4)


@query(
    "x_multimodal_resize",
    oracle=_MD5_BYTES_CTE
    + """
    SELECT asset_id, width, height,
           CAST(floor(CAST(width * 224 AS DOUBLE)
                      / greatest(width, height)) AS INT) AS resized_w,
           CAST(floor(CAST(height * 224 AS DOUBLE)
                      / greatest(width, height)) AS INT) AS resized_h,
           floor((CAST(224 AS DOUBLE) / greatest(width, height)) * 1e6 + 0.5)
               / 1e6 AS scale,
           greatest(width, height) <= 224 AS is_upscale
    FROM f
    """,
    tags=("multimodal", "tierx"),
)
def x_multimodal_resize(spark, sf_dir):
    """Resize planning over decoded assets — the aspect-preserving
    max-side-224 target geometry a vision preprocessing stage
    computes before the pixel resample (the resample itself is the
    codec-gated decode stub; the geometry, schema, and partitioning
    are the real Spark-side plumbing, and at 100 TB this arithmetic
    rides the same mapInPandas batches as the decode). Integer-safe:
    floor of a positive IEEE quotient on both engines, scale rounded
    to 6 dp."""
    feats = x_multimodal_features(spark, sf_dir)
    longest = F.greatest(F.col("width"), F.col("height"))
    return feats.select(
        "asset_id",
        "width",
        "height",
        F.floor(
            (F.col("width") * 224).cast("double") / longest
        )
        .cast("int")
        .alias("resized_w"),
        F.floor(
            (F.col("height") * 224).cast("double") / longest
        )
        .cast("int")
        .alias("resized_h"),
        (F.floor((F.lit(224.0) / longest) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "scale"
        ),
        (longest <= F.lit(224)).alias("is_upscale"),
    )
