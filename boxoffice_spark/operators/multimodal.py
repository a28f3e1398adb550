"""Multimodal column plumbing (BASELINE.json north-star).

Images/audio/video ride Spark as opaque ``binary`` payload columns next to
typed metadata — the lakehouse-standard layout (one row per asset, bytes
inline for small assets, URI + bytes-range for large ones). What the engine
owns is the *plumbing*: schema, partition-safe batch iteration, Arrow
transfer into Python decoders, and the explode shape for frame sampling.

The actual decoders (PIL/ffmpeg/torchaudio) are not in this container, so
``decode_image`` STUBS the real decode behind an import-try and falls back
to a deterministic fake "decoder" (header-derived pseudo-dimensions) — the
Spark-side contract (schemas, mapInPandas signatures, batch shapes) is real
and tested either way.

Fixture realization: documents.text utf-8-encoded as the binary payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# asset row layout: payload + typed metadata
ASSET_SCHEMA = (
    "asset_id long, payload binary, media_type string, "
    "meta struct<n_bytes: long, lang: string, source: string>"
)

FEATURE_SCHEMA = (
    "asset_id long, n_bytes long, sha1_prefix string, fake_width int, fake_height int"
)

FRAME_SCHEMA = "asset_id long, frame_no int, frame_bytes binary"


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build the multimodal asset table from the documents fixture:
    utf-8 bytes as payload, metadata struct alongside."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.col("n_chars").alias("n_bytes"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    Real path requires PIL — unavailable here, so a deterministic fake
    derives pseudo-dimensions from the payload header. The fallback covers
    BOTH missing-codec (ImportError) and undecodable-payload cases: the
    fixture payloads are utf-8 text bytes, so in an environment where PIL
    IS installed Image.open raises UnidentifiedImageError — that must fall
    back too, not kill the whole extract_features stage. Replace the
    except branch with ``raise`` to make decode failures loud instead.
    """
    try:
        from PIL import Image  # codec libs not in this container
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return im.size
    except Exception:
        h = hashlib.sha1(payload[:64]).digest()
        return (64 + h[0] % 192, 64 + h[1] % 192)  # deterministic fake decode


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Partition-parallel, ~10k-row Arrow batches; the per-byte work happens
    in vectorized Python once per batch, never per row via pickle. This is
    the D3 shape (reference goods_stock_pipeline.py:62-84 per-group
    external call) generalized to media decode.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [decode_image(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": payloads.map(len),
                    "sha1_prefix": payloads.map(lambda p: hashlib.sha1(p).hexdigest()[:12]),
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, n_frames: int = 4, frame_size: int = 32) -> DataFrame:
    """Frame sampling shape: one asset row -> n evenly-spaced byte-range
    'frames' (what video frame extraction looks like to the engine: an
    explode with per-frame payloads). Pure JVM — no Python in the path."""
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return (
        assets.select("asset_id", F.explode(idx).alias("frame_no"), F.col("payload"))
        .withColumn(
            "frame_bytes",
            F.expr(
                f"substring(payload, CAST(frame_no * greatest(length(payload) - {frame_size}, 0) "
                f"/ greatest({n_frames - 1}, 1) AS INT) + 1, {frame_size})"
            ),
        )
        .select("asset_id", "frame_no", "frame_bytes")
    )
