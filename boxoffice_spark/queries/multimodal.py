"""Multimodal-column queries (binary payload plumbing; see
operators/multimodal.py for the stubbed-decoder contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from boxoffice_spark.operators.multimodal import (
    assets_from_documents,
    extract_features,
    sample_frames,
)
from boxoffice_spark.registry import register
from boxoffice_spark.tables import table


@register(
    "m_asset_table",
    oracle="""
    SELECT doc_id AS asset_id, octet_length(encode(text)) AS payload_bytes,
           'text/plain' AS media_type, lang AS meta_lang
    FROM documents
    """,
    tags=("multimodal",),
)
def m_asset_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary asset-table construction: payload bytes + typed metadata.
    The byte length is oracle-checked (octet_length of the utf-8 payload);
    the payload itself stays opaque."""
    assets = assets_from_documents(table(spark, sf_dir, "documents"))
    return assets.select(
        "asset_id",
        F.octet_length("payload").alias("payload_bytes"),
        "media_type",
        F.col("meta.lang").alias("meta_lang"),
    )


@register("m_asset_features", oracle=None, tags=("multimodal", "pandas-udf"))
def m_asset_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas (deterministic fake decoder — real codecs stubbed, see
    operators/multimodal.py). Rows-only: sha1 isn't available to the
    oracle; determinism is asserted in tests/test_llm_ops.py."""
    return extract_features(assets_from_documents(table(spark, sf_dir, "documents")))


@register("m_frame_sample", oracle=None, tags=("multimodal", "frames"))
def m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling explode: 4 evenly-spaced 32-byte windows per asset —
    the video-frame-extraction shape, pure JVM."""
    return sample_frames(assets_from_documents(table(spark, sf_dir, "documents")))
