"""Multimodal + MapReduce-facade queries registered for the driver.

``multimodal_decode`` exercises the binary-column plumbing end-to-end
with the deterministic stub codec.  The metadata aggregate IS
SQL-expressible for the stub (sha256/length are portable), so it gets
a real oracle even though a production codec would be rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import as_binary_assets, decode_metadata
from .core import query, t


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Treat each document's text bytes as an opaque binary asset, run
    the Arrow-batched decode stub, return portable metadata columns."""
    docs = t(spark, sf, "documents")
    assets = as_binary_assets(docs, "doc_id", "text")
    return decode_metadata(assets).select("asset_id", "n_bytes", "sha256")


@query("multimodal_frame_sample", oracle=None)  # plumbing demo, rows-only
def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    assets = as_binary_assets(docs, "doc_id", "text")
    from ..operators.multimodal import frame_sample_offsets

    return frame_sample_offsets(decode_metadata(assets), n_frames=4)


@query("mapreduce_facade_wordcount", oracle=None)  # arbitrary-Python surface
def mapreduce_facade_wordcount(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's programming model (user mapper/reducer Python)
    run through the map_reduce facade over documents.text."""
    from ..operators.mapreduce import map_reduce

    docs = t(spark, sf, "documents").select(
        F.col("text").alias("line"), F.lit(0).cast("long").alias("byte_offset")
    )

    def mapper(row):
        for tok in row.line.split(" "):
            if tok:
                yield (tok, 1)

    return map_reduce(
        docs,
        mapper,
        lambda _k, ones: sum(ones),
        num_partitions=8,
        output_schema="word string, n long",
    )
