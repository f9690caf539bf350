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
    """The two-night RECURRENCE (VERDICT r10 #4): night 2 merges its
    delta into NIGHT 1'S MERGED ARTIFACT, and
    merged(merged(base, δ1), δ2) is bit-identical to a monolithic
    rebuild over base ∪ δ1 ∪ δ2.  Also pins the O(delta) contract
    mechanically: on a re-resolve of the fully-merged chain (the
    cross-session steady state, simulated by clearing session caches)
    NO thunk is invoked and no artifact is rewritten — every night is
    found by its snapshot-id key."""
    import os
    import shutil

    from distributedmapreduce_spark.operators.index_store import (
        index_path,
        merge_chain,
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
    paths = [
        index_path("pmh-chain", src, (params, "snap", sid), stable_src=True)
        for sid in ("base", "n1", "n2")
    ]
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)

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
        # first full build: each stage computed exactly once
        assert calls == {"base": 1, "d1": 1, "d2": 1}
        successes = [os.path.join(p, "_SUCCESS") for p in paths]
        assert all(os.path.exists(s) for s in successes)
        mtimes = [os.stat(s).st_mtime_ns for s in successes]

        def canon(df):
            return sorted(
                (r.doc_id, tuple(sorted(r.hs)),
                 tuple(r[f"m{i}"] for i in range(_PMH_N)))
                for r in df.collect()
            )

        # capture the canonical rows NOW — the rmtree below replaces
        # the n2 part files on disk, so re-collecting the `chained`
        # frame later would read a stale file listing
        chained_rows = canon(chained)
        assert chained_rows == canon(_pmh_signatures(docs))

        # steady-state re-resolve ("any later session"): pure key
        # lookups — no thunk runs, no artifact is rewritten
        spark.catalog.clearCache()
        again = merge_chain(
            spark, "pmh-chain", src, base_fn, deltas, params=params
        )
        assert calls == {"base": 1, "d1": 1, "d2": 1}, (
            "chain re-resolve re-invoked a build thunk"
        )
        assert [os.stat(s).st_mtime_ns for s in successes] == mtimes, (
            "chain re-resolve rewrote an artifact"
        )
        assert canon(again) == chained_rows

        # night-2 NEW-SESSION arrival mid-chain: wipe only the n2
        # artifact — the rebuild must re-run ONLY δ2 (night 1's merge
        # is read back by key, base and δ1 never recompute)
        shutil.rmtree(paths[2], ignore_errors=True)
        night2 = merge_chain(
            spark, "pmh-chain", src, base_fn, deltas, params=params
        )
        assert calls == {"base": 1, "d1": 1, "d2": 2}
        assert canon(night2) == chained_rows
    finally:
        for p in paths:
            shutil.rmtree(p, ignore_errors=True)


def test_merge_chain_stable_keying_survives_src_mutation(spark, tmp_path):
    """ADVICE r11 item 4: merge_chain keys chain artifacts on
    realpath + snapshot id WITHOUT the source file's size/mtime — in
    the nightly-arrival scenario src_path mutates every night, and a
    mtime-keyed chain would silently re-key every artifact into a
    full rebuild.  Pin: after the chain is built, mutate the source
    file (new mtime AND new size), clear session caches, re-resolve —
    every night must still be found by key (zero thunk invocations,
    zero artifact rewrites)."""
    import os
    import shutil

    from distributedmapreduce_spark.operators.index_store import (
        index_path,
        merge_chain,
    )

    src = str(tmp_path / "corpus.parquet")
    spark.range(0, 30).selectExpr(
        "id AS doc_id", "id * 3 AS sig"
    ).write.parquet(src)
    params = ("stable-key-test", 1)
    paths = [
        index_path("stk-chain", src, (params, "snap", sid), stable_src=True)
        for sid in ("base", "n1")
    ]
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
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
        mtimes = [
            os.stat(os.path.join(p, "_SUCCESS")).st_mtime_ns for p in paths
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
            os.stat(os.path.join(p, "_SUCCESS")).st_mtime_ns for p in paths
        ] == mtimes
        assert again.count() == 30  # the chain's own snapshots, unchanged
    finally:
        for p in paths:
            shutil.rmtree(p, ignore_errors=True)
