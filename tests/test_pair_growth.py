"""Scale-path blocking semantics (SCALE.md §9b): the paired-simhash
and auto-bits-embedding variants must keep their documented recall
and compatibility guarantees — these are the knobs a 100 TB run
flips, so their contracts are pinned at test scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedmapreduce_spark.plans.llm import (
    embedding_band_buckets,
    simhash_block_buckets,
)
from distributedmapreduce_spark.sources.testdata import load_table

from .conftest import SF_DIR_001


def _pairs(blocks):
    a = blocks.select("q", "qval", F.col("doc_id").alias("doc_a"))
    b = blocks.select("q", "qval", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["q", "qval"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def test_simhash_paired_candidates_subset_and_hamming3_complete(spark):
    """A block-pair match implies two single-block matches, so paired
    candidates are a subset of single-block candidates; and any pair
    with hamming <= 3 has >= 2 clean blocks (pigeonhole over 5), so
    the paired blocking must retain EVERY such pair."""
    single = _pairs(simhash_block_buckets(spark, SF_DIR_001))
    paired = _pairs(simhash_block_buckets(spark, SF_DIR_001, paired=True))
    assert paired.join(single, ["doc_a", "doc_b"], "left_anti").count() == 0

    sigs = (
        simhash_block_buckets(spark, SF_DIR_001)
        .select("doc_id", "sig")
        .distinct()
    )
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb"))
    ham3 = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
        .select("doc_a", "doc_b")
    )
    missed = ham3.join(paired, ["doc_a", "doc_b"], "left_anti").count()
    assert missed == 0


def test_embedding_auto_bits_matches_fixed_at_small_corpus(spark):
    """At a corpus small enough that auto mode (now the DEFAULT —
    bits_per_band=None) picks 4 bits, the buckets must be
    bit-identical to the legacy fixed 4-bit recipe (the compatibility
    claim that keeps tiny-fixture brute-force replicas valid)."""
    emb = load_table(spark, "embeddings", SF_DIR_001)
    n = emb.count()
    auto_bits = max(4, min(16, (max(n, 1) // 64).bit_length()))
    fixed = embedding_band_buckets(emb, bits_per_band=4)
    auto = embedding_band_buckets(emb)
    if auto_bits == 4:
        assert fixed.exceptAll(auto).count() == 0
        assert auto.exceptAll(fixed).count() == 0
    else:
        # corpus grew past the 4-bit regime: auto must produce a
        # strictly larger bucket space than fixed
        assert (
            auto.select("bucket").distinct().count()
            >= fixed.select("bucket").distinct().count()
        )


def test_lsh_bits_sql_matches_python_formula():
    """The oracle's integer-threshold CASE (_emb_lsh_bits_sql) must
    equal the Spark-side auto-bits formula for every corpus-size
    regime, including both clamp edges and the power-of-two
    boundaries — this equality is what makes the dynamic oracles
    exact at any scale."""
    import duckdb

    from distributedmapreduce_spark.plans.llm import (
        _emb_lsh_auto_bits,
        _emb_lsh_bits_sql,
    )

    sql = _emb_lsh_bits_sql()
    ns = (
        list(range(0, 200))
        + [63, 64, 65, 1023, 1024, 1025]
        + [64 * (1 << b) + d for b in range(3, 17) for d in (-1, 0, 1)]
    )
    con = duckdb.connect()
    for n in ns:
        con.execute(
            "CREATE OR REPLACE VIEW embeddings AS "
            f"SELECT * FROM range({max(n, 0)})"
        )
        (got,) = con.execute(sql).fetchone()
        assert got == _emb_lsh_auto_bits(n), (n, got)


def test_km_k_sql_matches_python_formula():
    """Same pin for the Lloyd trainer's auto-K: the km_k CTE must
    equal _km_auto_k for every corpus size, including the clamp
    edges."""
    import duckdb

    from distributedmapreduce_spark.plans.mlops import (
        _KM_K_CTE,
        _km_auto_k,
    )

    con = duckdb.connect()
    ns = (
        list(range(0, 300))
        + [511, 512, 513, 8191, 8192, 8193]
        + [128 * 4096 - 1, 128 * 4096, 128 * 4096 + 1, 10**7]
    )
    for n in ns:
        con.execute(
            "CREATE OR REPLACE VIEW embeddings AS "
            f"SELECT * FROM range({n})"
        )
        (got,) = con.execute(_KM_K_CTE).fetchone()
        assert got == _km_auto_k(n), (n, got)


def test_ivfpq_nprobe_sql_matches_python_formula():
    """nprobe = max(2, floor(sqrt(K))): the SQL expression and the
    Python twin must agree for every K in the auto range, including
    perfect squares (IEEE sqrt is correctly rounded, so the floor
    can't straddle a square boundary)."""
    import duckdb

    from distributedmapreduce_spark.plans.llm7 import (
        _IVFPQ_NPROBE_SQL,
        _ivfpq_nprobe,
    )

    con = duckdb.connect()
    for k in list(range(4, 200)) + [255, 256, 257, 4095, 4096]:
        (got,) = con.execute(
            f"SELECT {_IVFPQ_NPROBE_SQL.format(k=k)}"
        ).fetchone()
        assert got == _ivfpq_nprobe(k), (k, got)


def test_pann_bits_sql_matches_python_formula():
    """The [8, 24]-clamped width of ann_lsh_topk_portable: same
    integer-threshold CASE generator, different bounds — swept over
    both clamp edges and the power-of-two boundaries."""
    import duckdb

    from distributedmapreduce_spark.plans.llm import (
        _emb_lsh_bits_sql,
        _pann_auto_bits,
    )

    sql = _emb_lsh_bits_sql(8, 24)
    ns = (
        list(range(0, 200))
        + [64 * (1 << b) + d for b in range(6, 25) for d in (-1, 0, 1)]
    )
    con = duckdb.connect()
    for n in ns:
        con.execute(
            "CREATE OR REPLACE VIEW embeddings AS "
            f"SELECT * FROM range({max(n, 0)})"
        )
        (got,) = con.execute(sql).fetchone()
        assert got == _pann_auto_bits(n), (n, got)


def test_incremental_delta_candidates_complete_and_load_bearing(spark):
    """The incremental index's candidate stage (llm._pmh_delta_candidates)
    must be (a) COMPLETE: exactly the full `_pmh_candidates` enumeration
    restricted to delta-incident pairs — has_new bucket pruning changes
    which buckets get pair-expanded, never which delta-incident pairs
    come out; and (b) LOAD-BEARING: the fixture must contain base-only
    collision pairs that the pruned stage provably never expands
    (otherwise this test would pass vacuously on a corpus where every
    bucket holds a delta doc)."""
    from distributedmapreduce_spark.plans.llm import (
        _PMH_DELTA_MOD,
        _pmh_candidates,
        _pmh_delta_candidates,
        _pmh_signatures,
    )
    from distributedmapreduce_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", SF_DIR_001)
    merged = _pmh_signatures(docs).persist()
    full = _pmh_candidates(merged).persist()
    delta_incident = full.filter(
        (F.col("doc_a") % _PMH_DELTA_MOD == 0)
        | (F.col("doc_b") % _PMH_DELTA_MOD == 0)
    )
    inc = _pmh_delta_candidates(merged).persist()

    extra = inc.join(delta_incident, ["doc_a", "doc_b"], "left_anti").count()
    missed = delta_incident.join(inc, ["doc_a", "doc_b"], "left_anti").count()
    assert extra == 0, f"pruned stage invented {extra} candidate pairs"
    assert missed == 0, f"pruned stage dropped {missed} delta-incident pairs"

    base_only = full.filter(
        (F.col("doc_a") % _PMH_DELTA_MOD != 0)
        & (F.col("doc_b") % _PMH_DELTA_MOD != 0)
    ).count()
    assert base_only > 0, "fixture has no base-only collisions — vacuous"
    for df in (merged, full, inc):
        df.unpersist()
