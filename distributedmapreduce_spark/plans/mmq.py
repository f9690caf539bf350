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


@query(
    "multimodal_frame_sample",
    # offsets are pure arithmetic: floor(n_bytes*i/4), i in 0..3.
    # DuckDB CAST(double AS BIGINT) rounds-to-nearest where Spark's
    # cast truncates, hence the explicit floor (all values >= 0).
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(floor(strlen(text) * u.f / 4) AS BIGINT) AS frame_offset
    FROM documents, unnest([0, 1, 2, 3]) AS u(f)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video-style frame sampling plumbing: 4 evenly-spaced byte
    offsets per decoded binary asset (pure built-in expressions; a
    real codec swaps in at the decode stage)."""
    docs = t(spark, sf, "documents")
    assets = as_binary_assets(docs, "doc_id", "text")
    from ..operators.multimodal import frame_sample_offsets

    return frame_sample_offsets(decode_metadata(assets), n_frames=4)


@query(
    "mapreduce_facade_wordcount",
    oracle="""
    SELECT w AS word, count(*) AS n FROM (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS w
      FROM documents)
    GROUP BY w
    """,
)
def mapreduce_facade_wordcount(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's programming model (user mapper/reducer Python)
    run through the map_reduce facade over documents.text.  The
    execution path is the deliberate row-at-a-time RDD fidelity
    surface, but its OUTPUT is plain deterministic word counts — so
    it gets a full SQL oracle (hash-checked since round 3; the
    facade==DataFrame equivalence is separately pinned by
    tests/test_mapreduce.py)."""
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


@query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id AS asset_id, 224 AS target_w, 224 AS target_h,
           sha256(concat(sha256(text), ':224x224')) AS out_sha256
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Resize plumbing through the stub codec: the output hash chains
    the decode hash with the target dims, so the whole
    decode->transform pipeline is still oracle-checkable."""
    from ..operators.multimodal import resize_stub

    docs = t(spark, sf, "documents")
    assets = as_binary_assets(docs, "doc_id", "text")
    return resize_stub(decode_metadata(assets)).select(
        "asset_id", "target_w", "target_h", "out_sha256"
    )


@query("multimodal_feature_extract", oracle=None)  # sha256-fold, not SQL-portable
def multimodal_feature_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Encoder plumbing: binary payload -> 16-d feature vector via
    Arrow-batched mapInPandas; returns (asset_id, dim, l2) so the
    rows-only check still pins shape and determinism-adjacent stats."""
    from ..operators.multimodal import feature_extract_stub

    docs = t(spark, sf, "documents")
    feats = feature_extract_stub(as_binary_assets(docs, "doc_id", "text"))
    return feats.select(
        "asset_id",
        F.size("feature").alias("dim"),
        F.round(
            F.sqrt(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x * x)),
            4,
        ).alias("l2"),
    )
