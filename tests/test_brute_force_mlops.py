"""Hypothesis brute-force parity for the ML-ops battery
(plans/mlops.py): the REGISTERED DuckDB oracle runs on tiny random
tables and is compared against an independent naive-Python
implementation of the mathematical definition — closing the
both-engines-wrong-the-same-way blind spot.  The Spark==oracle leg is
covered by tools/check_oracle.py at sf0.01/10x/100x.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import date, timedelta

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from distributedmapreduce_spark.plans.core import registry
from distributedmapreduce_spark.plans.mlops import _KM_K, _KM_T


def _oracle_tables(name: str, tables: dict):
    sql = registry()[name].oracle
    assert sql, name
    con = duckdb.connect()
    for tname, pdf in tables.items():
        con.register(tname, pdf)
    return con.execute(sql).fetchall()


vecs_strategy = st.integers(min_value=2, max_value=4).flatmap(
    lambda dim: st.lists(
        st.lists(
            st.floats(
                min_value=-0.6,
                max_value=0.6,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=dim,
            max_size=dim,
        ),
        min_size=_KM_K,
        max_size=24,
    )
)


def _emb_df(vecs, labels=None):
    return pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": vecs,
            "label": labels if labels is not None else [0] * len(vecs),
        }
    )


def _quant(vecs):
    import math

    return [
        [math.floor(x * 100) + 128 for x in v] for v in vecs
    ]


def _km_python(vecs):
    """Naive replay of the exact integer Lloyd definition (K=_KM_K —
    valid only while the fixture stays under _KM_TARGET vectors, the
    auto-K=4 regime; asserted so strategy growth can't silently
    diverge from the production auto mode)."""
    from distributedmapreduce_spark.plans.mlops import _KM_TARGET

    assert len(vecs) < _KM_TARGET, "fixture left the auto-K=4 regime"
    q = _quant(vecs)
    cents = {j: list(q[j]) for j in range(_KM_K)}

    def code_of(v):
        return min(
            sum((a - b) * (a - b) for a, b in zip(v, m)) * _KM_K + j
            for j, m in cents.items()
        )

    for _ in range(_KM_T):
        members = defaultdict(list)
        for v in q:
            members[code_of(v) % _KM_K].append(v)
        cents = {
            j: [
                (2 * sum(col) + len(vs)) // (2 * len(vs))
                for col in zip(*vs)
            ]
            for j, vs in members.items()
        }
    out = defaultdict(lambda: [0, 0])
    for v in q:
        c = code_of(v)
        j = c % _KM_K
        out[j][0] += 1
        out[j][1] += c // _KM_K
    return sorted(
        (j, n, inertia, sum(cents[j]))
        for j, (n, inertia) in out.items()
    )


@settings(max_examples=30, deadline=None)
@given(vecs_strategy)
def test_kmeans_brute_force(vecs):
    got = sorted(
        _oracle_tables("kmeans_int8_lloyd", {"embeddings": _emb_df(vecs)})
    )
    assert got == _km_python(vecs)


scored_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # label
        st.floats(
            min_value=-0.6,
            max_value=0.6,
            allow_nan=False,
            allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=40,
)


def _scored_py(rows):
    import math

    return [
        (1 if lab == 0 else 0, math.floor(x * 1000)) for lab, x in rows
    ]


@settings(max_examples=40, deadline=None)
@given(scored_strategy)
def test_auc_brute_force(rows):
    emb = _emb_df(
        [[x] for _, x in rows], labels=[lab for lab, _ in rows]
    )
    ((pos, neg, auc_e6),) = _oracle_tables(
        "auc_binary_bucketed", {"embeddings": emb}
    )
    scored = _scored_py(rows)
    P = sum(y for y, _ in scored)
    N = len(scored) - P
    assert (pos, neg) == (P, N)
    if P == 0 or N == 0:
        assert auc_e6 == 0
        return
    pairs2 = 0
    for y, s in scored:
        if y:
            for y2, s2 in scored:
                if not y2:
                    pairs2 += 2 if s > s2 else (1 if s == s2 else 0)
    assert auc_e6 == pairs2 * 1_000_000 // (2 * P * N)


@settings(max_examples=40, deadline=None)
@given(scored_strategy)
def test_pr_curve_brute_force(rows):
    emb = _emb_df(
        [[x] for _, x in rows], labels=[lab for lab, _ in rows]
    )
    got = sorted(
        _oracle_tables("pr_curve_bucketed", {"embeddings": emb})
    )
    scored = _scored_py(rows)
    P = sum(y for y, _ in scored)
    exp = []
    for thr in sorted({s for _, s in scored}):
        tp = sum(1 for y, s in scored if y and s >= thr)
        fp = sum(1 for y, s in scored if not y and s >= thr)
        exp.append(
            (
                thr,
                tp,
                fp,
                tp * 1_000_000 // (tp + fp),
                0 if P == 0 else tp * 1_000_000 // P,
            )
        )
    assert got == sorted(exp)


orders_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),  # day offset
        st.integers(min_value=1, max_value=9_000_000),  # cents
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(orders_strategy)
def test_acf_brute_force(rows):
    base = date(2024, 1, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(1, len(rows) + 1)),
            "o_orderdate": [base + timedelta(days=d) for d, _ in rows],
            "o_totalprice": [c / 100.0 for _, c in rows],
        }
    )
    got = sorted(_oracle_tables("acf_daily_revenue", {"orders": orders}))
    daily = defaultdict(int)
    for d, c in rows:
        daily[d] += c
    days = sorted(daily)
    xs = [daily[d] // 10000 for d in days]
    mean = sum(xs) // len(xs)
    dv = [x - mean for x in xs]
    den = sum(v * v for v in dv)
    exp = []
    for k in range(1, 8):
        num = sum(dv[t] * dv[t - k] for t in range(k, len(dv)))
        np_k = max(0, len(dv) - k)
        if den == 0 or np_k == 0:
            acf = 0
        elif num < 0:
            acf = -((-num * 10000) // den)
        else:
            acf = (num * 10000) // den
        exp.append((k, np_k, acf))
    assert got == sorted(exp)


@settings(max_examples=40, deadline=None)
@given(scored_strategy)
def test_isotonic_brute_force(rows):
    from fractions import Fraction

    emb = _emb_df(
        [[x] for _, x in rows], labels=[lab for lab, _ in rows]
    )
    got = sorted(
        _oracle_tables("isotonic_calibration", {"embeddings": emb})
    )
    # bin reduction: scores can be negative, and BOTH engines truncate
    # integer division toward zero (Spark `div`, and DuckDB `//` on
    # INTEGER operands — verified directly; it floors only for
    # floats), while Python // floors — so replicate truncation
    agg = {}
    for y, s in _scored_py(rows):
        b = abs(s) // 100 * (1 if s >= 0 else -1)
        c, p = agg.get(b, (0, 0))
        agg[b] = (c + 1, p + y)
    bins = sorted(agg)
    cnt = [agg[b][0] for b in bins]
    pos = [agg[b][1] for b in bins]
    n = len(bins)
    # 1) PAVA (pool adjacent violators) with exact rationals
    blocks = [[cnt[i], pos[i]] for i in range(n)]  # [weight, sum]
    merged = []
    for blk in blocks:
        merged.append(blk)
        while len(merged) > 1 and (
            Fraction(merged[-2][1], merged[-2][0])
            >= Fraction(merged[-1][1], merged[-1][0])
        ):
            b2 = merged.pop()
            merged[-1] = [merged[-1][0] + b2[0], merged[-1][1] + b2[1]]
    pava = []
    for w, s in merged:
        # expand back to one value per ORIGINAL bin covered
        pava.append((w, Fraction(s, w)))
    fit_frac = []
    bi = 0
    for w, v in pava:
        covered = 0
        while covered < w:
            covered += cnt[bi]
            fit_frac.append(v)
            bi += 1
    # 2) minimax with exact rationals — must equal PAVA exactly
    P = [0]
    C = [0]
    for i in range(n):
        P.append(P[-1] + pos[i])
        C.append(C[-1] + cnt[i])
    mm_frac = [
        max(
            min(
                Fraction(P[k + 1] - P[j], C[k + 1] - C[j])
                for k in range(i, n)
            )
            for j in range(i + 1)
        )
        for i in range(n)
    ]
    assert fit_frac == mm_frac
    # 3) minimax with IEEE doubles — must equal the oracle exactly
    mm_float = [
        max(
            min(
                (P[k + 1] - P[j]) / (C[k + 1] - C[j])
                for k in range(i, n)
            )
            for j in range(i + 1)
        )
        for i in range(n)
    ]
    import math

    exp = sorted(
        (bins[i], cnt[i], pos[i], math.floor(mm_float[i] * 1_000_000))
        for i in range(n)
    )
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(vecs_strategy)
def test_coreset_brute_force(vecs):
    got = sorted(
        _oracle_tables(
            "coreset_centroid_topk", {"embeddings": _emb_df(vecs)}
        )
    )
    # replay the shared trainer, then rank (dist, vec_id) per cluster
    q = _quant(vecs)
    cents = {j: list(q[j]) for j in range(_KM_K)}

    def code_of(v):
        return min(
            sum((a - b) * (a - b) for a, b in zip(v, m)) * _KM_K + j
            for j, m in cents.items()
        )

    for _ in range(_KM_T):
        members = defaultdict(list)
        for v in q:
            members[code_of(v) % _KM_K].append(v)
        cents = {
            j: [
                (2 * sum(col) + len(vs)) // (2 * len(vs))
                for col in zip(*vs)
            ]
            for j, vs in members.items()
        }
    per = defaultdict(list)
    for vid, v in enumerate(q):
        c = code_of(v)
        per[c % _KM_K].append((c // _KM_K, vid))
    exp = []
    for cl, rows in per.items():
        for rnk, (dist, vid) in enumerate(sorted(rows)[:3], start=1):
            exp.append((cl, rnk, vid, dist))
    assert got == sorted(exp)


@settings(max_examples=40, deadline=None)
@given(orders_strategy)
def test_seasonal_decompose_brute_force(rows):
    base = date(2024, 1, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(1, len(rows) + 1)),
            "o_orderdate": [base + timedelta(days=d) for d, _ in rows],
            "o_totalprice": [c / 100.0 for _, c in rows],
        }
    )
    got = sorted(
        (r[0].toordinal() if hasattr(r[0], "toordinal") else r[0],)
        + tuple(r[1:])
        for r in _oracle_tables(
            "seasonal_decompose_daily", {"orders": orders}
        )
    )
    daily = defaultdict(int)
    for d, c in rows:
        daily[d] += c
    days = sorted(daily)
    xs = [daily[d] for d in days]
    n = len(days)
    trend = []
    for i in range(n):
        lo, hi = i - 3, i + 3
        if lo >= 0 and hi < n:
            s7 = sum(xs[lo : hi + 1])
            trend.append((2 * s7 + 7) // 14)
        else:
            trend.append(None)
    epoch = date(1970, 1, 1)
    dows = [((base + timedelta(days=d)) - epoch).days % 7 for d in days]
    per = defaultdict(list)
    for i in range(n):
        if trend[i] is not None:
            per[dows[i]].append(xs[i] - trend[i])
    sea = {}
    for dw, vs in per.items():
        s = sum(vs)
        c = len(vs)
        sea[dw] = (
            -((2 * (-s) + c) // (2 * c)) if s < 0 else (2 * s + c) // (2 * c)
        )
    exp = []
    for i in range(n):
        if dows[i] not in sea:
            continue  # no seasonal estimate for this dow -> inner join drops
        tr = trend[i]
        exp.append(
            (
                (base + timedelta(days=days[i])).toordinal(),
                xs[i],
                tr,
                sea[dows[i]],
                None if tr is None else xs[i] - tr - sea[dows[i]],
            )
        )
    assert got == sorted(exp)


docs_eval_strategy = st.lists(
    st.lists(
        st.sampled_from(
            ["scan", "fast", "merge", "batch", "hash", "value",
             "slow", "table", "other", ""]
        ),
        min_size=0,
        max_size=10,
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=40, deadline=None)
@given(docs_eval_strategy)
def test_retrieval_eval_brute_force(docs):
    from distributedmapreduce_spark.plans.textq import _EVAL_QUERIES

    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, len(docs) + 1)),
            "text": [" ".join(ws) for ws in docs],
            "lang": ["en"] * len(docs),
            "source": ["src0"] * len(docs),
            "n_chars": [len(" ".join(ws)) for ws in docs],
        }
    )
    got = sorted(
        _oracle_tables("retrieval_eval_first_rank", {"documents": pdf})
    )
    exp = []
    for qid, terms in _EVAL_QUERIES:
        cand = []  # (doc_id, score, relevant)
        for did, ws in enumerate(docs, start=1):
            ws = [w for w in ws if w]
            score = sum(1 for w in ws if w in terms)
            if score:
                hit = {w for w in ws if w in terms}
                cand.append((did, score, len(hit) == len(terms)))
        if not cand:
            continue  # no candidate docs -> query absent from output
        rel = [(s, d) for d, s, r in cand if r]
        if not rel:
            exp.append((qid, len(cand), 0, 0))
            continue
        bs, bd = max((s, -d) for s, d in rel)
        bd = -bd
        above = sum(
            1
            for d, s, _ in cand
            if s > bs or (s == bs and d < bd)
        )
        exp.append((qid, len(cand), len(rel), above + 1))
    assert got == sorted(exp)


@settings(max_examples=40, deadline=None)
@given(orders_strategy)
def test_conformal_intervals_brute_force(rows):
    base = date(2024, 1, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(1, len(rows) + 1)),
            "o_orderdate": [base + timedelta(days=d) for d, _ in rows],
            "o_totalprice": [c / 100.0 for _, c in rows],
        }
    )
    got = sorted(
        _oracle_tables(
            "forecast_conformal_intervals", {"orders": orders}
        )
    )
    daily = defaultdict(int)
    for d, c in rows:
        daily[d] += c
    days = sorted(daily)
    xs = [daily[d] for d in days]
    n = len(days)
    epoch = date(1970, 1, 1)
    per = defaultdict(list)  # dow -> [(absr, day_ordinal)]
    sea_in = defaultdict(list)
    detr = {}
    for i in range(n):
        lo, hi = i - 3, i + 3
        if lo >= 0 and hi < n:
            s7 = sum(xs[lo : hi + 1])
            tr = (2 * s7 + 7) // 14
            dw = ((base + timedelta(days=days[i])) - epoch).days % 7
            detr[i] = (dw, xs[i] - tr)
            sea_in[dw].append(xs[i] - tr)
    sea = {}
    for dw, vs in sea_in.items():
        s, c = sum(vs), len(vs)
        sea[dw] = (
            -((2 * (-s) + c) // (2 * c)) if s < 0 else (2 * s + c) // (2 * c)
        )
    for i, (dw, dv) in detr.items():
        per[dw].append((abs(dv - sea[dw]), days[i]))
    exp = []
    for dw, vs in per.items():
        vs.sort()
        k = (9 * len(vs) + 9) // 10
        p90 = vs[k - 1][0]
        exp.append(
            (dw, len(vs), sea[dw], p90, sea[dw] - p90, sea[dw] + p90)
        )
    assert got == sorted(exp)


# --- literal vs Arrow-batched assignment parity ---------------------------


def test_km_code_pandas_path_matches_literal(spark):
    """The K > _KM_LIT_CAP assignment (Arrow-batched numpy packed
    argmin) must be bit-identical to the literal codegen expression —
    the equivalence that makes the corpus-scaled auto-K path exact:
    past _KM_LIT_CAP centroids (8, the measured break-even —
    SCALE.md §10b) every caller silently switches implementation,
    so the two forms are pinned equal on the real trained state."""
    from distributedmapreduce_spark.plans.mlops import (
        _km_code_col,
        _km_train,
    )

    base, cents, k, _low = _km_train(spark, "/root/testdata/sf0.01")
    lit = base.select(
        "vec_id", _km_code_col(cents, k).alias("code")
    )
    pnd = base.select(
        "vec_id",
        _km_code_col(cents, k, force_pandas=True).alias("code"),
    )
    assert lit.exceptAll(pnd).count() == 0
    assert pnd.exceptAll(lit).count() == 0
    base.unpersist()
