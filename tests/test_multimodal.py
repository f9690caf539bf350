"""Multimodal honesty guards: the decode path is a DETERMINISTIC STUB
(no image/audio codec libraries exist in this container) — strict mode
must refuse loudly rather than hand back fake pixels, and the stub
must stay deterministic so its oracle twins keep holding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedmapreduce_spark.operators.multimodal import (
    as_binary_assets,
    decode_metadata,
)


def _assets(spark):
    df = spark.createDataFrame(
        [(1, b"fake-jpeg-bytes"), (2, b"other-payload")],
        "asset_id long, payload binary",
    )
    return as_binary_assets(df, "asset_id", "payload")


def test_decode_strict_mode_raises(spark):
    """strict=True must surface the missing-codec condition as an
    error, not silently return stub dimensions."""
    from py4j.protocol import Py4JJavaError

    strict = decode_metadata(_assets(spark), strict=True)
    with pytest.raises(Exception) as exc_info:
        strict.collect()
    # the NotImplementedError is raised inside the Python worker and
    # surfaces wrapped; assert the codec message survives the trip
    assert "no image codec" in str(exc_info.value)


def test_decode_stub_deterministic(spark):
    """Same payload -> same stub metadata on every run (the property
    the oracle twins rely on)."""
    a = {r.asset_id: (r.width, r.height, r.n_channels, r.sha256)
         for r in decode_metadata(_assets(spark)).collect()}
    b = {r.asset_id: (r.width, r.height, r.n_channels, r.sha256)
         for r in decode_metadata(_assets(spark)).collect()}
    assert a == b
    assert a[1] != a[2]  # different payloads -> different digests
