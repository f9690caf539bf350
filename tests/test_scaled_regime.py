"""Deterministic large-fixture replicas for the CORPUS-SCALED
blocking regimes (round 7): the hypothesis brute-force suites only
reach the auto formulas' floors (bits=4, K=4) because their tables
stay tiny, so these fixtures pin the >floor regimes — a 1100-vector
corpus (auto bits = 5) for the sign-LSH dedup oracle and a
700-vector corpus (auto K = 5) for the Lloyd-trainer oracle —
against independent naive-Python replays.  Vectors are a fixed
integer-hash sequence (no RNG), so the test is bit-reproducible.
"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pandas as pd

from distributedmapreduce_spark.plans.core import registry


def _vec(i: int, dim: int = 64) -> list[float]:
    # deterministic pseudo-vectors in [-0.5, 0.5); Weyl-style integer
    # hash, never all-zero (component 0 offset keeps norm > 0)
    out = []
    for d in range(dim):
        h = (i * 64 + d) * 2654435761 % 2**32
        out.append(((h % 1000) / 1000.0) - 0.5)
    if all(abs(x) < 1e-12 for x in out):
        out[0] = 0.25
    return out


def _emb_df(n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "vec_id": list(range(n)),
            "embedding": [_vec(i) for i in range(n)],
            "label": [i % 3 for i in range(n)],
        }
    )


def _run_oracle(name: str, pdf: pd.DataFrame):
    con = duckdb.connect()
    con.register("embeddings", pdf)
    return con.execute(registry()[name].oracle).fetchall()


def _auto_bits(n: int) -> int:
    return max(4, min(16, (max(n, 1) // 64).bit_length()))


def _bucket(v: list[float], band: int, bits: int) -> int:
    out = 0
    for j in range(bits):
        if j < 4:
            bit = v[band * 4 + j] > 0
        else:
            p = (band * 4 + j * 7) % 64
            q = (band * 4 + j * 13 + 1) % 64
            bit = v[p] > v[q]
        out += (1 << j) if bit else 0
    return out


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_dedup_embedding_auto_bits_5bit_regime():
    n = 1100  # 1100 // 64 = 17 -> bit_length 5: the FIRST scaled regime
    assert _auto_bits(n) == 5
    pdf = _emb_df(n)
    got = _run_oracle("dedup_embedding_cosine", pdf)
    got_pairs = {(a, b): c for a, b, c in got}

    vecs = [list(v) for v in pdf["embedding"]]
    cand = set()
    by_bucket = defaultdict(list)
    for i, v in enumerate(vecs):
        for band in range(16):
            by_bucket[(band, _bucket(v, band, 5))].append(i)
    for ids in by_bucket.values():
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                cand.add((ids[x], ids[y]))
    exp = {
        (a, b): _cos(vecs[a], vecs[b])
        for a, b in cand
        if _cos(vecs[a], vecs[b]) >= 0.4
    }
    assert set(got_pairs) == set(exp)
    for k, c in exp.items():
        # oracle publishes round(cos, 4); compare against the
        # unrounded replay with a half-ulp-of-4dp bound (the Python
        # round() half-even trap — ORACLE_PORTABILITY.md)
        assert abs(got_pairs[k] - c) <= 5.01e-5, (k, got_pairs[k], c)


def test_kmeans_auto_k_5cluster_regime():
    n = 700  # 700 // 128 = 5: the first K > 4 regime
    pdf = _emb_df(n)
    got = sorted(_run_oracle("kmeans_int8_lloyd", pdf))

    k = max(4, min(4096, n // 128))
    assert k == 5
    q = [[math.floor(x * 100) + 128 for x in v] for v in pdf["embedding"]]
    cents = {j: list(q[j]) for j in range(k)}

    def code_of(v, cb):
        return min(
            sum((a - b) * (a - b) for a, b in zip(v, m)) * k + j
            for j, m in cb.items()
        )

    for _ in range(3):
        members = defaultdict(list)
        for v in q:
            members[code_of(v, cents) % k].append(v)
        cents = {
            j: [
                (2 * sum(col) + len(vs)) // (2 * len(vs))
                for col in zip(*vs)
            ]
            for j, vs in members.items()
        }
    agg = defaultdict(lambda: [0, 0])
    for v in q:
        c = code_of(v, cents)
        agg[c % k][0] += 1
        agg[c % k][1] += c // k
    exp = sorted(
        (j, cnt, inertia, sum(cents[j]))
        for j, (cnt, inertia) in agg.items()
    )
    assert got == exp
