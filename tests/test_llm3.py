"""Curation stage-2 invariants (plans/llm3.py) beyond the oracle
hash-match: packing conservation/density, sampling determinism across
parallelism, and shard balance."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedmapreduce_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.01"


def test_sequence_packing_conserves_and_fills(spark):
    out = QUERIES["sequence_packing"](spark, SF).cache()
    per_seq = (
        out.groupBy("seq_id").agg(F.sum("n_tokens").alias("tok")).collect()
    )
    last = max(r.seq_id for r in per_seq)
    for r in per_seq:
        if r.seq_id == last:
            assert 0 < r.tok <= 256
        else:
            assert r.tok == 256, f"seq {r.seq_id} not full: {r.tok}"
    # conservation: every token of every non-empty doc lands somewhere
    total = out.agg(F.sum("n_tokens")).collect()[0][0]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = (
        docs.select(
            F.size(F.filter(F.split("text", " "), lambda x: x != F.lit("")))
            .alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total == want
    out.unpersist()


def test_quality_sample_invariant_to_parallelism(spark):
    a = {
        r.doc_id
        for r in QUERIES["quality_weighted_sample"](spark, SF).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = {
            r.doc_id
            for r in QUERIES["quality_weighted_sample"](spark, SF).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b and 0 < len(a) < 500


def test_global_shuffle_shards_are_balanced_partition(spark):
    out = QUERIES["global_shuffle_shard"](spark, SF)
    rows = out.collect()
    assert len(rows) == 500
    assert {r.shard_id for r in rows} == set(range(8))
    # positions are contiguous 1..k within each shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_linear_counting_estimator_accuracy(spark):
    """The linear-counting estimate -K*ln(1-V/K) derived from the
    sketch state must land within 5% of the exact distinct count
    (ln() is evaluated here, not in the oracle hash — libm is the
    one non-bit-portable piece)."""
    import math

    from distributedmapreduce_spark.plans.registry import QUERIES

    r = QUERIES["approx_distinct_linear_portable"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    est = -r.k * math.log(1 - r.v_occupied / r.k)
    assert abs(est - r.exact_nd) / r.exact_nd < 0.05, (est, r.exact_nd)


def test_incremental_minhash_merge_equals_rebuild(spark):
    """The mergeability claim behind minhash_index_incremental_update:
    for disjoint doc sets, signatures computed per-part and unioned
    are BIT-IDENTICAL to a monolithic rebuild — min() is distributive
    over disjoint union and the shingle hashes are per-doc.  This is
    what licenses the nightly append-only index update: no old
    signature ever needs recomputing."""
    from distributedmapreduce_spark.plans.llm import (
        _PMH_DELTA_MOD,
        _pmh_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = _pmh_signatures(
        docs.filter(F.col("doc_id") % _PMH_DELTA_MOD != 0)
    )
    delta = _pmh_signatures(
        docs.filter(F.col("doc_id") % _PMH_DELTA_MOD == 0)
    )
    merged = base.unionByName(delta)
    rebuilt = _pmh_signatures(docs)

    def canon(df):
        return sorted(
            (r.doc_id, tuple(sorted(r.hs)),
             tuple(r[f"m{i}"] for i in range(8)))
            for r in df.collect()
        )

    assert canon(merged) == canon(rebuilt)


def test_incremental_minhash_pairs_touch_delta(spark):
    """Every emitted pair has at least one delta-side doc, and the
    pair set equals the delta-touching subset of the full portable
    dedup's pair set at the same threshold — incrementality changes
    work, never values."""
    from distributedmapreduce_spark.plans.llm import _PMH_DELTA_MOD

    inc = {
        (r.doc_a, r.doc_b, r.jac_e6)
        for r in QUERIES["minhash_index_incremental_update"](
            spark, SF
        ).collect()
    }
    assert all(
        a % _PMH_DELTA_MOD == 0 or b % _PMH_DELTA_MOD == 0
        for a, b, _ in inc
    )
    full = {
        (r.doc_a, r.doc_b, r.jac_e6)
        for r in QUERIES["dedup_minhash_portable"](spark, SF).collect()
    }
    expect = {
        (a, b, j) for a, b, j in full
        if a % _PMH_DELTA_MOD == 0 or b % _PMH_DELTA_MOD == 0
    }
    assert inc == expect


def test_merge_index_lifecycle_persists_across_reads(spark):
    """The nightly read→update→re-read lifecycle (VERDICT r09 #3):
    merge_index persists base ∪ delta under the updated corpus
    fingerprint; the SECOND call must be a pure parquet read (thunks
    not invoked, artifact untouched on disk), and the read-back must
    be bit-identical to a monolithic rebuild — i.e. night 2 really
    reads night 1's merge rather than recomputing it."""
    import os

    from distributedmapreduce_spark.operators.index_store import (
        index_path,
        merge_index,
    )
    from distributedmapreduce_spark.plans.llm import (
        _PMH_DELTA_MOD,
        _PMH_N,
        _pmh_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = f"{SF}/documents.parquet"
    params = ("pmh-lifecycle-test", _PMH_N, f"mod{_PMH_DELTA_MOD}")
    path = index_path("pmh-merged", src, params)
    import shutil

    shutil.rmtree(path, ignore_errors=True)  # fresh lifecycle

    # ADVICE r10: the artifact lives under the shared repo-level
    # spark-warehouse/indexes dir — always remove it, even when an
    # assertion between build and teardown fails.
    try:
        calls = {"base": 0, "delta": 0}

        def base_fn():
            calls["base"] += 1
            return _pmh_signatures(
                docs.filter(F.col("doc_id") % _PMH_DELTA_MOD != 0)
            )

        def delta_fn():
            calls["delta"] += 1
            return _pmh_signatures(
                docs.filter(F.col("doc_id") % _PMH_DELTA_MOD == 0)
            )

        merged1 = merge_index(
            spark, "pmh-merged", src, base_fn, delta_fn, params=params
        )
        assert calls == {"base": 1, "delta": 1}
        success = os.path.join(path, "_SUCCESS")
        assert os.path.exists(success)
        mtime1 = os.stat(success).st_mtime_ns

        # "night 2": a fresh reader of the same corpus fingerprint —
        # clear session-side caches so the read is genuinely from disk
        spark.catalog.clearCache()
        merged2 = merge_index(
            spark, "pmh-merged", src, base_fn, delta_fn, params=params
        )
        assert calls == {"base": 1, "delta": 1}, (
            "thunks re-invoked on re-read"
        )
        assert os.stat(success).st_mtime_ns == mtime1, "artifact rewritten"

        def canon(df):
            return sorted(
                (r.doc_id, tuple(sorted(r.hs)),
                 tuple(r[f"m{i}"] for i in range(_PMH_N)))
                for r in df.collect()
            )

        rebuilt = _pmh_signatures(docs)
        assert canon(merged2) == canon(rebuilt)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_merge_chain_two_nights_equals_rebuild(spark):
    """The two-night RECURRENCE (VERDICT r10 #4), unified onto the
    log-structured segment store (VERDICT r12 #4): night 2's delta
    lands as one tagged segment on top of night 1's, and the live-set
    read is bit-identical to a monolithic rebuild over
    base ∪ δ1 ∪ δ2.  Also pins the O(delta) contract mechanically: a
    re-resolve of the fully-merged chain (the cross-session steady
    state, simulated by clearing session caches) invokes NO thunk and
    rewrites NO child; each night's segment holds only its own delta
    rows (never a base copy); losing the newest segment re-runs ONLY
    that night's thunk; and reusing a position with a different
    snapshot id raises instead of silently serving stale rows."""
    import os
    import shutil

    import pytest

    from distributedmapreduce_spark.operators.index_store import (
        merge_chain,
        stream_index_path,
    )
    from distributedmapreduce_spark.plans.llm import (
        _PMH_DELTA_MOD,
        _PMH_N,
        _PMH_NIGHT2_MOD,
        _pmh_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = f"{SF}/documents.parquet"
    params = ("pmh-chain-test", _PMH_N, f"mod{_PMH_DELTA_MOD}")
    mod = F.col("doc_id") % _PMH_DELTA_MOD
    path = stream_index_path(
        "pmh-chain", os.path.realpath(src), params
    )
    shutil.rmtree(path, ignore_errors=True)

    try:
        calls = {"base": 0, "d1": 0, "d2": 0}

        def base_fn():
            calls["base"] += 1
            return _pmh_signatures(
                docs.filter((mod != 0) & (mod != _PMH_NIGHT2_MOD))
            )

        def d1():
            calls["d1"] += 1
            return _pmh_signatures(docs.filter(mod == 0))

        def d2():
            calls["d2"] += 1
            return _pmh_signatures(docs.filter(mod == _PMH_NIGHT2_MOD))

        deltas = [("n1", d1), ("n2", d2)]
        chained = merge_chain(
            spark, "pmh-chain", src, base_fn, deltas, params=params
        )
        # first full build: each stage computed exactly once, each
        # night ONE tagged delta segment (no base copies)
        assert calls == {"base": 1, "d1": 1, "d2": 1}
        children = sorted(os.listdir(path))
        assert children == [
            "seg-" + "0" * 20 + "-base",
            "seg-" + "0" * 19 + "1-n1",
            "seg-" + "0" * 19 + "2-n2",
        ]
        n_d2 = spark.read.parquet(os.path.join(path, children[2])).count()
        assert n_d2 == docs.filter(mod == _PMH_NIGHT2_MOD).count()
        successes = [
            os.path.join(path, c, "_SUCCESS") for c in children
        ]
        mtimes = [os.stat(s).st_mtime_ns for s in successes]

        def canon(df):
            return sorted(
                (r.doc_id, tuple(sorted(r.hs)),
                 tuple(r[f"m{i}"] for i in range(_PMH_N)))
                for r in df.collect()
            )

        chained_rows = canon(chained)
        assert chained_rows == canon(_pmh_signatures(docs))

        # steady-state re-resolve ("any later session"): watermark
        # lookups only — no thunk runs, no child is rewritten
        spark.catalog.clearCache()
        again = merge_chain(
            spark, "pmh-chain", src, base_fn, deltas, params=params
        )
        assert calls == {"base": 1, "d1": 1, "d2": 1}, (
            "chain re-resolve re-invoked a build thunk"
        )
        assert [os.stat(s).st_mtime_ns for s in successes] == mtimes, (
            "chain re-resolve rewrote a segment"
        )
        assert canon(again) == chained_rows

        # position reuse with a DIFFERENT snapshot id must raise
        # while the segment is live — never silently serve stale rows
        with pytest.raises(ValueError, match="append-only"):
            merge_chain(
                spark, "pmh-chain", src, base_fn,
                [("n1", d1), ("n2-REBUILT", d2)], params=params,
            )

        # night-2 NEW-SESSION arrival mid-chain: lose only the newest
        # segment — the rebuild re-runs ONLY δ2 (the watermark finds
        # base and δ1 committed, their thunks never re-run)
        shutil.rmtree(os.path.join(path, children[2]))
        night2 = merge_chain(
            spark, "pmh-chain", src, base_fn, deltas, params=params
        )
        assert calls == {"base": 1, "d1": 1, "d2": 2}
        assert canon(night2) == chained_rows
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_merge_chain_compaction_folds_nights(spark, tmp_path):
    """VERDICT r12 #4's unification dividend: the nightly chain uses
    the SAME compaction mechanism as the streaming path — with
    compact_every=2 the three nights fold into one compact child, the
    read-back is unchanged, and later nights append on top of the
    compaction."""
    import os
    import shutil

    from distributedmapreduce_spark.operators.index_store import (
        merge_chain,
        stream_index_path,
    )

    src = str(tmp_path / "corpus.parquet")
    spark.range(0, 40).selectExpr(
        "id AS doc_id", "id * 3 AS sig"
    ).write.parquet(src)
    params = ("compact-chain-test", 1)
    path = stream_index_path(
        "cmp-chain", os.path.realpath(src), params
    )
    shutil.rmtree(path, ignore_errors=True)
    try:
        rd = lambda lo, hi: spark.read.parquet(src).filter(  # noqa: E731
            f"doc_id >= {lo} AND doc_id < {hi}"
        )
        got = merge_chain(
            spark, "cmp-chain", src, lambda: rd(0, 20),
            [("n1", lambda: rd(20, 30)), ("n2", lambda: rd(30, 40))],
            params=params, compact_every=2,
        )
        assert sorted(r.doc_id for r in got.collect()) == list(range(40))
        children = sorted(os.listdir(path))
        assert len(children) == 1 and children[0].startswith("compact-")

        # a later night appends a segment on top of the compaction
        spark.range(40, 45).selectExpr(
            "id AS doc_id", "id * 3 AS sig"
        ).write.mode("append").parquet(src)
        got2 = merge_chain(
            spark, "cmp-chain", src, lambda: rd(0, 20),
            [("n1", lambda: rd(20, 30)), ("n2", lambda: rd(30, 40)),
             ("n3", lambda: rd(40, 45))],
            params=params, compact_every=99,
        )
        assert sorted(r.doc_id for r in got2.collect()) == list(range(45))
        assert any(
            c.startswith("seg-") and c.endswith("-n3")
            for c in os.listdir(path)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_merge_chain_stable_keying_survives_src_mutation(spark, tmp_path):
    """ADVICE r11 item 4: merge_chain keys the chain artifact on
    realpath + params WITHOUT the source file's size/mtime — in the
    nightly-arrival scenario src_path mutates every night, and an
    mtime-keyed chain would silently re-key every artifact into a
    full rebuild.  Pin: after the chain is built, mutate the source
    file (new mtime AND new size), clear session caches, re-resolve —
    the watermark must find every night committed (zero thunk
    invocations, zero child rewrites)."""
    import os
    import shutil

    from distributedmapreduce_spark.operators.index_store import (
        merge_chain,
        stream_index_path,
    )

    src = str(tmp_path / "corpus.parquet")
    spark.range(0, 30).selectExpr(
        "id AS doc_id", "id * 3 AS sig"
    ).write.parquet(src)
    params = ("stable-key-test", 1)
    path = stream_index_path(
        "stk-chain", os.path.realpath(src), params
    )
    shutil.rmtree(path, ignore_errors=True)
    try:
        calls = {"base": 0, "d1": 0}

        def base_fn():
            calls["base"] += 1
            return spark.read.parquet(src).filter("doc_id < 20")

        def d1():
            calls["d1"] += 1
            return spark.read.parquet(src).filter("doc_id >= 20")

        first = merge_chain(
            spark, "stk-chain", src, base_fn, [("n1", d1)], params=params
        )
        assert first.count() == 30
        assert calls == {"base": 1, "d1": 1}
        children = sorted(os.listdir(path))
        mtimes = [
            os.stat(os.path.join(path, c, "_SUCCESS")).st_mtime_ns
            for c in children
        ]

        # the nightly arrival: the corpus file grows in place — new
        # size, new mtime (what broke mtime-keyed lookups)
        spark.range(0, 40).selectExpr(
            "id AS doc_id", "id * 3 AS sig"
        ).write.mode("overwrite").parquet(src)
        spark.catalog.clearCache()

        again = merge_chain(
            spark, "stk-chain", src, base_fn, [("n1", d1)], params=params
        )
        assert calls == {"base": 1, "d1": 1}, (
            "src mutation re-keyed the chain into a rebuild"
        )
        assert [
            os.stat(os.path.join(path, c, "_SUCCESS")).st_mtime_ns
            for c in children
        ] == mtimes
        assert again.count() == 30  # the chain's own snapshots, unchanged
    finally:
        shutil.rmtree(path, ignore_errors=True)
