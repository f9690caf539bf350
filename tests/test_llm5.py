"""Invariants for the round-4 extension ops (plans/llm5.py) beyond
their oracle hash-match: prefix-filter losslessness against a
brute-force all-pairs Jaccard, Bloom-filter zero-false-negative
guarantee, phrase-adjacency parity with a Python scan, rolling-window
parity with a per-user Python replay, and OLS parity with numpy."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from distributedmapreduce_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _shingle_set(text: str) -> set[str]:
    ws = [w for w in text.lower().split(" ") if w]
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


def test_prefix_join_matches_bruteforce(spark):
    """The prefix filter is LOSSLESS: result == brute-force all-pairs
    Jaccard >= 1/2 within (lang, source) blocks."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_block: dict[tuple, list] = {}
    for r in docs:
        sh = _shingle_set(r.text)
        if sh:
            by_block.setdefault((r.lang, r.source), []).append((r.doc_id, sh))
    expected = set()
    for block in by_block.values():
        for i in range(len(block)):
            for j in range(i + 1, len(block)):
                (da, sa), (db, sb) = block[i], block[j]
                if da > db:
                    (da, sa), (db, sb) = (db, sb), (da, sa)
                inter = len(sa & sb)
                union = len(sa | sb)
                if inter * 2 >= union:
                    expected.add((da, db, inter, union))
    got = {
        (r.doc_a, r.doc_b, r.n_inter, r.n_union)
        for r in QUERIES["set_similarity_prefix_join"](spark, SF).collect()
    }
    assert got == expected


def test_bloom_semi_join_no_false_negatives(spark):
    """A Bloom filter admits every true match (no false negatives), and
    per-status n_true equals the exact semi-join count."""
    out = {
        r.o_orderstatus: r
        for r in QUERIES["bloom_semi_join_audit"](spark, SF).collect()
    }
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    build = {r.c_custkey for r in cust.filter(F.col("c_acctbal") > 9000).collect()}
    truth: dict[str, int] = {}
    for r in orders.select("o_orderstatus", "o_custkey").collect():
        if r.o_custkey in build:
            truth[r.o_orderstatus] = truth.get(r.o_orderstatus, 0) + 1
    for status, n in truth.items():
        assert out[status].n_true == n
        assert out[status].n_candidates >= n
        assert out[status].n_false_pos == out[status].n_candidates - n


def test_phrase_search_matches_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    expected = {}
    for phrase in ("join filter", "sort key", "query key scan"):
        pw = phrase.split()
        k = len(pw)
        for r in docs:
            ws = [w for w in r.text.lower().split(" ") if w]
            hits = [
                i + 1
                for i in range(len(ws) - k + 1)
                if ws[i : i + k] == pw
            ]
            if hits:
                expected[(r.doc_id, phrase)] = (len(hits), hits[0])
    got = {
        (r.doc_id, r.phrase): (r.n_occurrences, r.first_pos)
        for r in QUERIES["phrase_search_positions"](spark, SF).collect()
    }
    assert got == expected


def test_rolling_window_matches_python_replay(spark):
    rows = QUERIES["window_time_range_rolling"](spark, SF).collect()
    from distributedmapreduce_spark.sources.testdata import load_table

    events = sorted(
        (
            (r.user_id, r.sec, r.event_id, r.cents)
            for r in load_table(spark, "events", SF)
            .select(
                "event_id",
                "user_id",
                (F.unix_micros("ts") / 1_000_000).cast("long").alias("sec"),
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
            .collect()
        )
    )
    by_user: dict[int, list] = {}
    for u, sec, eid, cents in events:
        by_user.setdefault(u, []).append((sec, eid, cents))
    expected = {}
    for u, evs in by_user.items():
        for sec, eid, _ in evs:
            in_frame = [e for e in evs if sec - 3600 <= e[0] <= sec]
            expected[eid] = (len(in_frame), sum(e[2] for e in in_frame))
    got = {r.event_id: (r.n_1h, r.sum_cents_1h) for r in rows}
    assert got == expected


def test_ols_matches_numpy(spark):
    rows = QUERIES["groupwise_ols_price_qty"](spark, SF01).collect()
    li = (
        spark.read.parquet(f"{SF01}/lineitem.parquet")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        .collect()
    )
    groups: dict[tuple, list] = {}
    for r in li:
        groups.setdefault((r.l_returnflag, r.l_linestatus), []).append((r.x, r.y))
    assert rows
    for r in rows:
        xs, ys = zip(*groups[(r.l_returnflag, r.l_linestatus)])
        slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
        corr = np.corrcoef(xs, ys)[0, 1]
        assert abs(r.slope_cents - slope) < max(1e-3, abs(slope) * 1e-5)
        assert abs(r.intercept_cents - intercept) < max(0.5, abs(intercept) * 1e-4)
        assert abs(r.r2 - corr**2) < 1e-5


def test_weighted_sample_is_k_per_group_and_biased(spark):
    """A-ES: exactly k rows per event_type, and the weighted sample's
    mean weight exceeds the population mean (heavier rows are
    preferred) across groups on average."""
    import math

    from distributedmapreduce_spark.sources.testdata import load_table

    out = QUERIES["weighted_sample_aes"](spark, SF01).collect()
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r.event_id)
    ev = {
        r.event_id: (r.event_type, round(r.value * 100))
        for r in load_table(spark, "events", SF01)
        .select("event_id", "event_type", "value")
        .collect()
    }
    for ids in by_type.values():
        assert len(ids) == 4
    # replay A-ES in python: the selected ids must equal the top-k by
    # -ln(u)/w with the same md5 uniform
    import hashlib

    def key(eid, w):
        u32 = int(hashlib.md5(f"aes:{eid}".encode()).hexdigest()[:8], 16)
        u = (u32 + 1) / 4294967296.0
        return (-math.log(u) / w, eid)

    expect: dict[str, list] = {}
    for eid, (etype, cents) in ev.items():
        if cents >= 1:
            expect.setdefault(etype, []).append((key(eid, cents), eid))
    for etype, rows in expect.items():
        top = [eid for _, eid in sorted(rows)[:4]]
        assert sorted(by_type[etype]) == sorted(top)


def test_table_checksum_detects_any_single_row_change(spark):
    """(n_rows, checksum) matches a python replay, and flipping one
    row's price changes exactly that bucket's checksum."""
    import hashlib

    out = {
        r.o_orderstatus: (r.n_rows, r.checksum)
        for r in QUERIES["table_checksum_additive"](spark, SF).collect()
    }
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .selectExpr(
            "o_orderkey", "o_custkey", "o_orderstatus",
            "CAST(round(o_totalprice * 100) AS LONG) AS cents",
            "CAST(CAST(o_orderdate AS DATE) AS STRING) AS d",
            "o_orderpriority",
        )
        .collect()
    )

    def u32(canon: str) -> int:
        return int(hashlib.md5(f"cks:{canon}".encode()).hexdigest()[:8], 16)

    expect: dict[str, list] = {}
    for r in rows:
        canon = "|".join(
            [str(r.o_orderkey), str(r.o_custkey), r.o_orderstatus,
             str(r.cents), r.d, r.o_orderpriority]
        )
        expect.setdefault(r.o_orderstatus, []).append(u32(canon))
    for status, hs in expect.items():
        assert out[status] == (len(hs), sum(hs))
    # single-row sensitivity: perturbing one row's cents moves the sum
    r0 = rows[0]
    canon0 = "|".join(
        [str(r0.o_orderkey), str(r0.o_custkey), r0.o_orderstatus,
         str(r0.cents), r0.d, r0.o_orderpriority]
    )
    canon1 = canon0.replace(f"|{r0.cents}|", f"|{r0.cents + 1}|", 1)
    assert u32(canon1) != u32(canon0)


def test_heavy_hitters_mg_threshold_boundary(spark, tmp_path):
    """Adversarial boundary corpus for the Misra-Gries pass: with
    K=49 the output rule is cnt*(K+1) > n strictly.  Build a corpus
    where one word sits EXACTLY at n/(K+1) (must be excluded), one
    just above (must be included), and the rest is a sea of distinct
    filler — the regime where a lossy candidate pass would drop the
    hitter."""
    from distributedmapreduce_spark.plans.llm5 import _MG_K
    from distributedmapreduce_spark.plans.registry import QUERIES

    k1 = _MG_K + 1  # 50
    # n = 5000 tokens total: 'hot' 101 > 100 = n/50; 'edge' exactly 100;
    # filler: 4799 distinct singletons
    words = ["hot"] * 101 + ["edge"] * 100 + [f"f{i}" for i in range(4799)]
    assert len(words) == 5000
    # spread across 10 docs so several partitions/batches see the stream
    docs = [
        (i, " ".join(words[i * 500 : (i + 1) * 500])) for i in range(10)
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        2
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.word: r.cnt
        for r in QUERIES["heavy_hitters_mg"](spark, str(tmp_path)).collect()
    }
    assert out == {"hot": 101}, out
    assert 101 * k1 > 5000 and 100 * k1 == 5000  # the boundary it pins
