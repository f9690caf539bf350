"""Multimodal honesty guards, real-codec edition (round 6): malformed
payloads must refuse loudly (a real decoder's failure mode — replaces
the retired stub-family strict gates), and decode/transform outputs
must be deterministic and agree with the independent encoders."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from distributedmapreduce_spark.operators.multimodal import (
    as_binary_assets,
    byte_histogram,
    decode_real,
    header_scan,
    pcm_frame_sample,
    resize_nearest,
)


def _assets(spark):
    from distributedmapreduce_spark.operators.codecs import (
        encode_bmp,
        encode_png,
        encode_wav,
        ramp_bytes,
    )

    df = spark.createDataFrame(
        [
            (1, encode_png(6, 4, ramp_bytes(7, 6 * 4 * 3), 3)),
            (2, encode_bmp(5, 3, ramp_bytes(11, 5 * 3 * 3))),
            (3, encode_wav(2, 16000, 16, ramp_bytes(200, 32 * 2 * 2))),
        ],
        "asset_id long, payload binary",
    )
    return as_binary_assets(df, "asset_id", "payload")


def test_malformed_payload_raises(spark):
    """A corrupt byte stream must surface as an error from the Python
    worker, never as silently-fake metadata (the honesty property the
    old strict-mode stub gate pinned, now enforced by the REAL
    parsers: bad magic bytes -> ValueError)."""
    bad = spark.createDataFrame(
        [(1, b"not-a-real-media-payload")], "asset_id long, payload binary"
    )
    with pytest.raises(Exception) as exc_info:
        decode_real(bad).collect()
    assert "unknown payload format" in str(exc_info.value)


def test_corrupt_png_crc_raises(spark):
    """Flipping one IDAT byte must break the chunk CRC check."""
    from distributedmapreduce_spark.operators.codecs import (
        encode_png,
        ramp_bytes,
    )

    good = bytearray(encode_png(6, 4, ramp_bytes(7, 6 * 4 * 3), 3))
    good[40] ^= 0xFF  # inside IHDR/IDAT territory, past the signature
    bad = spark.createDataFrame(
        [(1, bytes(good))], "asset_id long, payload binary"
    )
    with pytest.raises(Exception) as exc_info:
        decode_real(bad).collect()
    assert "CRC mismatch" in str(exc_info.value) or "PNG" in str(
        exc_info.value
    )


def test_header_scan_matches_decode_geometry(spark):
    """The no-inflate header scan and the full decoder must agree on
    every shared geometry column for all three formats."""
    full = {r.asset_id: r for r in decode_real(_assets(spark)).collect()}
    head = {r.asset_id: r for r in header_scan(_assets(spark)).collect()}
    assert set(full) == set(head) == {1, 2, 3}
    for aid in full:
        for col in ("format", "width", "height", "n_channels",
                    "sample_rate", "n_frames"):
            assert getattr(full[aid], col) == getattr(head[aid], col), (
                aid,
                col,
            )
    assert head[1].n_chunks == 3  # IHDR + IDAT + IEND
    assert head[2].n_chunks is None
    assert head[3].n_chunks == 2  # fmt + data


def test_transforms_deterministic_and_grounded(spark):
    """Transforms recompute identically and match hand-derived truth
    on tiny fixtures."""
    a = _assets(spark)
    r1 = sorted(resize_nearest(a.filter("asset_id < 3"), 2, 2).collect())
    r2 = sorted(resize_nearest(a.filter("asset_id < 3"), 2, 2).collect())
    assert r1 == r2
    # png asset: 6x4x3 ramp from 7 -> 2x2 nearest picks rows 0,2 cols 0,3
    px = lambda y, x, ch, w, c, d: (d + (y * w + x) * c + ch) % 256
    want = sum(
        px(y, x, ch, 6, 3, 7)
        for y in (0, 2)
        for x in (0, 3)
        for ch in range(3)
    )
    got = {r.asset_id: r.out_sum for r in r1}[1]
    assert got == want
    # wav asset: 32 frames, 2ch -> sampled frame idxs 0,8,16,24
    fs = sorted(
        pcm_frame_sample(a.filter("asset_id = 3"), 4).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in fs] == [0, 8, 16, 24]
    assert [r.frame_offset for r in fs] == [44 + i * 4 for i in (0, 8, 16, 24)]
    lo, hi = (200 + 0) % 256, (200 + 1) % 256
    uv = lo + 256 * hi
    assert fs[0].sample_i16 == (uv - 65536 if uv >= 32768 else uv)
    # histogram counts must total the raster size
    hist = byte_histogram(a.filter("asset_id = 1"), 16).collect()
    assert sum(r.n_in_bin for r in hist) == 6 * 4 * 3
    assert len(hist) == 16


def test_phash_banded_equals_bruteforce(spark):
    """The Hamming-banded pair stage of dedup_phash_images is COMPLETE
    for the verified threshold: 4 blocks over a 16-bit hash + the
    pigeonhole principle mean any pair within Hamming <= 3 shares at
    least one exact block, so the banded result must equal the
    all-pairs brute force over the same signatures — banding changes
    work, never values."""
    from distributedmapreduce_spark.plans.mmq import (
        _PHASH_HAM,
        phash_signatures,
    )
    from distributedmapreduce_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.01"
    sig = {
        r.asset_id: r.ph for r in phash_signatures(spark, sf).collect()
    }
    ids = sorted(sig)
    brute = {
        (a, b, (sig[a] ^ sig[b]).bit_count())
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if (sig[a] ^ sig[b]).bit_count() <= _PHASH_HAM
    }
    banded = {
        (r.asset_a, r.asset_b, r.hamming)
        for r in QUERIES["dedup_phash_images"](spark, sf).collect()
    }
    assert banded == brute and len(brute) > 0


def test_audio_segment_matches_python_islands(spark):
    """multimodal_audio_segment == a plain-Python reimplementation
    over the decoded PCM: 16-window energy, cross-multiplied activity,
    gaps-and-islands — derived here independently from the codec,
    never from the query's own expressions."""
    import numpy as np

    from distributedmapreduce_spark.operators.codecs import wav_layout
    from distributedmapreduce_spark.plans.mmq import (
        _VAD_W,
        encode_fixture_assets,
    )
    from distributedmapreduce_spark.plans.core import t
    from distributedmapreduce_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = t(spark, sf, "documents").filter("doc_id % 3 = 2").limit(40)
    payloads = {
        r.asset_id: bytes(r.payload)
        for r in encode_fixture_assets(docs).collect()
    }
    expect = set()
    for aid, data in payloads.items():
        fmt, pos, dlen, _ = wav_layout(data)
        pcm = np.frombuffer(data, "<i2", count=dlen // 2, offset=pos)
        ch0 = pcm[:: fmt[1]].astype("int64")
        nf = len(ch0)
        w = (np.arange(nf) * _VAD_W) // nf
        es = np.bincount(w, weights=np.abs(ch0), minlength=_VAD_W)
        en = np.bincount(w, minlength=_VAD_W)
        ts, tn = int(es.sum()), int(en.sum())
        active = [
            i for i in range(_VAD_W) if int(es[i]) * tn > ts * int(en[i])
        ]
        segs, cur = [], None
        for i in active:
            if cur and i == cur[-1] + 1:
                cur.append(i)
            else:
                cur = [i]
                segs.append(cur)
        for sid, seg in enumerate(segs, 1):
            expect.add((
                aid, sid, seg[0], seg[-1], len(seg),
                int(en[seg].sum()), int(es[seg].sum()),
            ))
    got = {
        (r.asset_id, r.seg_id, r.start_w, r.end_w, r.n_windows,
         r.frames, r.energy)
        for r in QUERIES["multimodal_audio_segment"](spark, sf)
        .filter(F.col("asset_id").isin(list(payloads)))
        .collect()
    }
    assert got == expect and len(expect) > 0


def test_keyframe_extract_two_per_clip_at_planted_cut(spark):
    """Every scene-cut clip yields EXACTLY two keyframes — frame 0 and
    the planted cut frame c = 1 + (d % (nf-1)) — and each keyframe's
    byte_sum equals the numpy sum of the decoded raster (independent
    decode here, not the query's)."""
    import numpy as np

    from distributedmapreduce_spark.operators.codecs import (
        decode_avi_frames,
    )
    from distributedmapreduce_spark.plans.mmq import (
        encode_scenecut_video_assets,
    )
    from distributedmapreduce_spark.plans.core import t
    from distributedmapreduce_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = t(spark, sf, "documents").limit(30)
    payloads = {
        r.asset_id: bytes(r.payload)
        for r in encode_scenecut_video_assets(docs).collect()
    }
    rows = (
        QUERIES["multimodal_keyframe_extract"](spark, sf)
        .filter(F.col("asset_id").isin(list(payloads)))
        .collect()
    )
    by_asset: dict[int, list] = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert set(by_asset) == set(payloads)
    for aid, krows in by_asset.items():
        d = aid % 256
        nf = 4 + d % 5
        c = 1 + (d % (nf - 1))
        krows.sort(key=lambda r: r.scene_id)
        assert [r.frame_idx for r in krows] == [0, c]
        assert [r.scene_id for r in krows] == [1, 2]
        frames = decode_avi_frames(payloads[aid])
        for r in krows:
            raster = np.frombuffer(frames[r.frame_idx], np.uint8)
            assert r.byte_sum == int(raster.astype("int64").sum())
            assert r.n_bytes == len(raster)
