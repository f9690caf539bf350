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
