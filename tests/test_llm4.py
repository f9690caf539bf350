"""Invariants for the model-informed curation ops (plans/llm4.py)
and the round-3 analytics additions beyond their oracle hash-match:
entropy bounds, surprisal/PMI consistency, exact-Gram parity with
numpy, PCA eigenvector quality, PageRank mass conservation, and
winsorization clamps."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from distributedmapreduce_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_char_entropy_bounds(spark):
    rows = QUERIES["doc_char_entropy"](spark, SF).collect()
    assert rows
    for r in rows:
        # H in [0, log2(n_chars)] and below log2(alphabet ~ 40)
        assert 0.0 <= r.entropy_bits <= min(math.log2(r.n_chars), 6.0) + 1e-9


def test_char_entropy_matches_python(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    got = {
        r.doc_id: (r.n_chars, r.entropy_bits)
        for r in QUERIES["doc_char_entropy"](spark, SF).collect()
    }
    for doc_id, text in docs.items():
        from collections import Counter

        c = Counter(text)
        n = sum(c.values())
        h = math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n
        assert got[doc_id][0] == n
        assert abs(got[doc_id][1] - h) < 1e-3


def test_surprisal_nonnegative_and_bigram_count(spark):
    out = QUERIES["lm_bigram_surprisal"](spark, SF).collect()
    toks = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.size(
                F.filter(F.split("text", " "), lambda x: x != F.lit(""))
            ).alias("n"),
        )
        .collect()
    )
    want = {r.doc_id: r.n - 1 for r in toks if r.n >= 2}
    got = {r.doc_id: r.n_bigrams for r in out}
    assert got == want
    assert all(r.avg_surprisal_bits >= -1e-9 for r in out)


def test_pmi_min_count_and_finiteness(spark):
    rows = QUERIES["pmi_bigram_scores"](spark, SF01).collect()
    assert rows
    for r in rows:
        assert r.n12 >= 5
        assert math.isfinite(r.pmi_bits)
        # PMI of a pair can't exceed -log2 p(w1 w2) = log2(T / n12)
        # with T >= n12; a loose sanity band suffices here.
        assert -30.0 < r.pmi_bits < 30.0


def test_gram_matches_numpy_exactly(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    m = np.stack([np.array(r.embedding, dtype="float64") for r in emb])
    q = np.floor(m * 1e4 + 0.5).astype("int64")
    g = q.T @ q
    rows = QUERIES["embedding_gram_int"](spark, SF).collect()
    assert len(rows) == 64 * 65 // 2
    for r in rows:
        assert r.s_qq == g[r.i, r.j], (r.i, r.j)
        assert r.n_vecs == len(emb)


def test_pca_project_matches_pure_python_replay(spark):
    """Independent from-scratch replay of the rank-1 decomposition
    spec (r05: deterministic integer power-iteration direction +
    mu-centered projection + exact Cauchy-Schwarz residual) in pure
    Python ints — exact equality on every vector, plus resid2 >= 0."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    q = [
        [int(np.floor(x * 1e4 + 0.5)) for x in r.embedding] for r in emb
    ]
    n, d = len(q), len(q[0])
    trunc = lambda a, b: (a // b) if a >= 0 else -((-a) // b)  # noqa: E731
    sx = [sum(row[i] for row in q) for i in range(d)]
    g = [
        [
            n * sum(row[i] * row[j] for row in q) - sx[i] * sx[j]
            for j in range(d)
        ]
        for i in range(d)
    ]
    gd = max(1, max(abs(x) for row in g for x in row) // (1 << 30))
    gn = [[trunc(x, gd) for x in row] for row in g]
    v = [1 << 12] * d
    for _ in range(8):
        w = [sum(gn[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(1, max(abs(x) for x in w))
        v = [trunc(x * (1 << 12), m) for x in w]
    imax = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[imax] < 0:
        v = [-x for x in v]
    u = [trunc(x, 16) for x in v]
    mu = [trunc(sx[i], n) for i in range(d)]
    uu = sum(x * x for x in u)
    want = {}
    for vid, row in enumerate(q):
        c = [row[i] - mu[i] for i in range(d)]
        pc1 = sum(c[i] * u[i] for i in range(d))
        want[emb[vid].vec_id] = (pc1, uu * sum(x * x for x in c) - pc1 * pc1)
    got = {
        r.vec_id: (r.pc1_q, r.resid2_q)
        for r in QUERIES["embedding_pca_project"](spark, SF).collect()
    }
    assert got == want
    assert all(r2 >= 0 for _, r2 in got.values())  # Cauchy-Schwarz


def test_pagerank_mass_conserved(spark):
    rows = QUERIES["pagerank_event_types"](spark, SF01).collect()
    total = sum(r.pagerank for r in rows)
    # no dangling nodes in this graph -> mass stays 1
    assert abs(total - 1.0) < 1e-3
    assert all(r.pagerank > 0 for r in rows)


def test_winsorized_values_clamped(spark):
    """Nearest-rank cents bounds (the query's round-4 semantics: no
    cross-engine percentile interpolation) computed by an independent
    driver-side replay."""
    import math

    out = QUERIES["event_robust_outliers"](spark, SF01)
    rows = (
        spark.read.parquet(f"{SF01}/events.parquet")
        .select("event_type", F.round(F.col("value") * 100).cast("long").alias("c"))
        .collect()
    )
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.c)
    bounds = {}
    for ty, cs in by_type.items():
        cs.sort()
        n = len(cs)
        pick = lambda pct: cs[math.ceil(pct * n / 100.0) - 1]  # noqa: E731
        bounds[ty] = (pick(1) / 100.0, pick(99) / 100.0)
    for r in out.collect():
        lo, hi = bounds[r.event_type]
        assert lo - 1e-9 <= r.value_winsor <= hi + 1e-9
        if r.is_outlier:
            assert abs(r.robust_z_e4) > 35000


def test_full_outer_covers_both_sides(spark):
    out = QUERIES["join_full_outer_balance_orders"](spark, SF01).collect()
    # both null-extension directions must actually occur
    assert any(not r.has_profile for r in out)
    assert any(r.has_profile and r.n_orders == 0 for r in out)
    keys = [r.custkey for r in out]
    assert len(keys) == len(set(keys))


def test_power_iteration_exact_integer_replay(spark):
    """embedding_power_iteration is specified as exact integer ops —
    an independent numpy int64 replay of the driver loop must match
    the Spark output bit-for-bit, and the sign canonicalization must
    leave the largest-|.| vector entry positive."""
    import numpy as np

    from distributedmapreduce_spark.plans.llm4 import _pi_vector

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet").collect()
    m = np.stack([r.embedding for r in emb]).astype("float64")
    q = np.floor(m * 1e4 + 0.5).astype(object)  # python ints, no overflow
    n, d = q.shape
    s = {}
    for i in range(d):
        for j in range(d):
            s[i, j] = int(sum(int(q[v, i]) * int(q[v, j]) for v in range(n)))
    sx = [int(q[:, i].sum()) for i in range(d)]
    v = _pi_vector(s, sx, n, d)
    assert max(v, key=abs) > 0  # sign-canonical
    want = {
        r.vec_id: sum((n * int(q[k, i]) - sx[i]) * v[i] for i in range(d))
        for k, r in enumerate(emb)
    }
    got = {
        r.vec_id: r.pc1pi_q
        for r in QUERIES["embedding_power_iteration"](spark, SF01).collect()
    }
    assert got == want


def test_dsir_importance_select_matches_python(spark):
    """dsir_importance_select == a plain-Python DSIR reimplementation
    (hashed-bigram multinomials, add-1 smoothing, log importance
    weights, rounded-score top-K) built here from the raw parquet via
    hashlib — independent of every Spark/DuckDB expression."""
    import hashlib
    import math
    from collections import Counter

    import duckdb

    from distributedmapreduce_spark.plans.llm4 import (
        _DSIR_B,
        _DSIR_K,
    )
    from distributedmapreduce_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text, lang FROM '{sf}/documents.parquet'"
    ).fetchall()

    def bucket(bigram: str) -> int:
        h = hashlib.md5(f"D:{bigram}".encode()).hexdigest()[:8]
        return int(h, 16) % _DSIR_B

    per_doc: dict[int, Counter] = {}
    tc = Counter()
    rc = Counter()
    for doc_id, text, lang in docs:
        toks = [x for x in text.split(" ") if x != ""]
        c = Counter(
            bucket(f"{a} {b}") for a, b in zip(toks, toks[1:])
        )
        if not c:
            continue
        per_doc[doc_id] = c
        rc.update(c)
        if lang == "en":
            tc.update(c)
    tt, rr = sum(tc.values()), sum(rc.values())
    shift = math.log(rr + _DSIR_B) - math.log(tt + _DSIR_B)
    logw = {
        d: sum(
            n * (math.log(tc.get(b, 0) + 1) - math.log(rc[b] + 1))
            for b, n in c.items()
        )
        + sum(c.values()) * shift
        for d, c in per_doc.items()
    }
    expect = sorted(
        logw, key=lambda d: (-round(logw[d], 6), d)
    )[:_DSIR_K]

    rows = QUERIES["dsir_importance_select"](spark, sf).collect()
    got = [r.doc_id for r in sorted(rows, key=lambda r: r.rnk)]
    assert got == expect
    for r in rows:
        assert abs(r.logw_r - round(logw[r.doc_id], 6)) < 2e-6
        assert r.n_feats == sum(per_doc[r.doc_id].values())
