"""Multimodal column plumbing (SURVEY.md §7.6 / north star).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The Spark-side machinery — schema, partition-sized Arrow batches,
mapInPandas signatures — is real and tested; the actual codec step is
STUBBED (this container has no image/audio libraries) behind a
deterministic fake so pipelines are runnable end-to-end:

- ``decode_stub``: derives fake (width, height, n_channels) from a
  stable hash of the bytes; raises NotImplementedError when
  ``strict=True`` (the behavior a real deployment would see without
  codecs installed).
- ``frame_sample_stub``: picks deterministic frame offsets.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "asset_id long, n_bytes long, width int, height int, n_channels int, "
    "sha256 string"
)


def as_binary_assets(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Normalize any table into the multimodal asset shape:
    (asset_id: long, payload: binary)."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.col(payload_col).cast("binary").alias("payload"),
    )


def _fake_dims(digest: bytes) -> tuple[int, int, int]:
    w = 64 + digest[0] % 192  # deterministic 64..255
    h = 64 + digest[1] % 192
    c = 1 + digest[2] % 4
    return w, h, c


def decode_metadata(assets: DataFrame, strict: bool = False) -> DataFrame:
    """'Decode' each binary payload to image metadata via mapInPandas —
    Arrow-batched, partition-parallel; the real codec call would slot
    into ``_decode_one`` unchanged."""

    def _decode_one(payload: bytes) -> tuple[int, int, int, str]:
        if strict:
            raise NotImplementedError(
                "no image codec in this environment; deterministic stub only"
            )
        digest = hashlib.sha256(payload).digest()
        w, h, c = _fake_dims(digest)
        return w, h, c, digest.hex()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "sha256": [d[3] for d in decoded],
                }
            )

    return assets.mapInPandas(_batches, schema=DECODED_SCHEMA)


def frame_sample_offsets(decoded: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic frame-sampling plan: n_frames evenly-spaced byte
    offsets per asset (stand-in for video frame extraction) — pure
    built-in expressions, no Python."""
    return decoded.select(
        "asset_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_frames - 1)),
                lambda i: (F.col("n_bytes") * i / n_frames).cast("long"),
            )
        ).alias("frame_offset"),
    )



def resize_stub(decoded: DataFrame, target_w: int = 224, target_h: int = 224,
                strict: bool = False) -> DataFrame:
    """'Resize' each decoded asset to (target_w, target_h) via
    mapInPandas.  A real deployment swaps ``_resize_one`` for a
    PIL/opencv call; the Spark plumbing (Arrow batches, schema,
    partition parallelism) is identical.  The stub emits a
    deterministic output hash derived from (sha256, target dims)."""

    def _resize_one(sha: str) -> str:
        if strict:
            raise NotImplementedError(
                "no image codec in this environment; deterministic stub only"
            )
        return hashlib.sha256(
            f"{sha}:{target_w}x{target_h}".encode()
        ).hexdigest()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "resized_stub": True,
                    "out_sha256": [_resize_one(s) for s in pdf["sha256"]],
                }
            )

    schema = (
        "asset_id long, width int, height int, target_w int, target_h int, "
        "resized_stub boolean, out_sha256 string"
    )
    return decoded.mapInPandas(_batches, schema=schema)


def feature_extract_stub(assets: DataFrame, dim: int = 16,
                         strict: bool = False) -> DataFrame:
    """'Embed' each binary payload into a dim-float feature vector via
    mapInPandas (stand-in for a vision/audio encoder).  Deterministic:
    component j is a [-1,1) float folded out of the payload sha256."""

    def _embed_one(payload: bytes) -> list[float]:
        if strict:
            raise NotImplementedError(
                "no encoder in this environment; deterministic stub only"
            )
        out = []
        digest = b""
        while len(out) < dim:
            digest = hashlib.sha256(payload + digest).digest()
            for k in range(0, min(len(digest), 4 * (dim - len(out))), 4):
                v = int.from_bytes(digest[k : k + 4], "big")
                out.append(v / 2**31 - 1.0)
        return out[:dim]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "feature": [_embed_one(p) for p in pdf["payload"]],
                }
            )

    return assets.mapInPandas(_batches, schema="asset_id long, feature array<double>")


DECODED_REAL_SCHEMA = (
    "asset_id long, format string, width long, height long, "
    "n_channels long, sample_rate long, n_frames long, "
    "n_raster_bytes long, checksum long"
)


def decode_real(assets: DataFrame) -> DataFrame:
    """REAL multimodal decode (VERDICT r04 #2 — the de-stubbed path):
    parse each binary payload as an actual PNG / BMP / WAV byte stream
    with the pure-stdlib codecs in ``operators/codecs.py`` (zlib
    inflate + filter reversal + CRC verification for PNG; header
    arithmetic for BMP/WAV) inside the same Arrow-batched mapInPandas
    shape as the stub path.  Output geometry + additive raster
    checksum is SQL-derivable for fixture payloads, which is what
    makes this hash-checkable end to end.  Scale: per-asset work only,
    no shuffle — decode parallelism is exactly scan parallelism."""
    from .codecs import decode_asset

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [decode_asset(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                rows,
                columns=[
                    "format",
                    "width",
                    "height",
                    "n_channels",
                    "sample_rate",
                    "n_frames",
                    "n_raster_bytes",
                    "checksum",
                ],
            )
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return assets.mapInPandas(_batches, schema=DECODED_REAL_SCHEMA)
