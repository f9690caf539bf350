"""Minimum-recall gate for the corpus-scaled sign-LSH blocking
(VERDICT r07 next-round #5).

tools/recall_audit.py MEASURES the recall/cost tradeoff of the
auto-width banding; nothing previously FAILED if a future width or
hyperplane change tanked recall — the tradeoff was documentation.
This test pins floors at the thresholds the operators actually act
on (the cos >= 0.6 near-dup decision band, SCALE.md §9x-a) for the
shared blocker of ``dedup_embedding_cosine`` and
``hard_negative_mining`` (both call ``embedding_band_buckets`` in
auto mode):

- sf0.01, bits=4 (the fixture floor regime): recall >= 0.95 at
  cos >= 0.4 — the only populated band there (zero true pairs exist
  at >= 0.6 in the 500-vector corpus, measured 0.9661 at gate time).
- sf0.1, bits=5 (first scaled regime): recall >= 0.95 at cos >= 0.6.
- 10x key-shifted replica, bits=9 (the SCALE.md §9x-a regime):
  recall >= 0.95 at cos >= 0.6, including the 90,000 planted
  exact-duplicate pairs, plus the cross-label (hard-negative
  candidate) restriction when non-vacuous.

The 10x leg exploits the replica's construction instead of a 20k^2
sweep: gen_scale.py tiles sf0.1's vectors with shifted vec_ids ONLY,
and both the cosine and the signature recipe are functions of the
vector alone, so for copies a of i and b of j: cos(ia, jb) = cos(i,
j) and share(ia, jb) = share(i, j) under the tiled corpus'
bit-width.  True pairs therefore split into 2000 x C(10,2) = 90,000
same-origin pairs (cos = 1, identical signatures -> always caught)
and 100 copies of each cross-origin base pair, giving

    recall_10x(t) = (90000 + 100 * caught_base@bits9(t))
                  / (90000 + 100 * true_base(t))

computable exactly from the 2000-vector base with 9-bit signatures.

The signature replay below is written independently of the
production code (the test_scaled_regime discipline) so a silent
recipe change breaks the gate instead of moving both sides.
"""

from __future__ import annotations

import numpy as np
import pytest

BANDS = 16
FLOOR = 0.95


def _load(dirpath: str) -> np.ndarray:
    import duckdb

    rows = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{dirpath}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


def _load_labels(dirpath: str) -> np.ndarray:
    import duckdb

    rows = duckdb.sql(
        f"SELECT label FROM read_parquet('{dirpath}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    return np.array([r[0] for r in rows])


def _auto_bits(n: int) -> int:
    # independent replay of _emb_lsh_auto_bits
    return max(4, min(16, (max(n, 1) // 64).bit_length()))


def _signatures(V: np.ndarray, bits: int) -> np.ndarray:
    """Independent replay of embedding_band_buckets' auto recipe:
    bits 0..3 component signs, bits >= 4 coordinate-difference
    hyperplane signs sign(x[p] - x[q])."""
    n = len(V)
    sig = np.zeros((n, BANDS), dtype=np.int64)
    for band in range(BANDS):
        for j in range(bits):
            if j < 4:
                bit = V[:, band * 4 + j] > 0
            else:
                p = (band * 4 + j * 7) % 64
                q = (band * 4 + j * 13 + 1) % 64
                if p == q:
                    q = (q + 1) % 64
                bit = V[:, p] > V[:, q]
            sig[:, band] += bit.astype(np.int64) << j
    return sig


def _pair_stats(
    V: np.ndarray, bits: int, thr: float, mask: np.ndarray | None = None
) -> tuple[int, int]:
    """(true_pairs, caught_pairs) at cos >= thr for upper-triangle
    pairs; ``mask`` (n x n bool) optionally restricts the pair set
    (cross-label for the hard-negative gate)."""
    n = len(V)
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    sig = _signatures(V, bits)
    true_c = caught = 0
    B = 1000
    for i0 in range(0, n, B):
        S = U[i0 : i0 + B] @ U.T
        share = np.zeros(S.shape, dtype=bool)
        for band in range(BANDS):
            share |= sig[i0 : i0 + B, band][:, None] == sig[None, :, band]
        upper = np.arange(n)[None, :] > (i0 + np.arange(S.shape[0]))[:, None]
        m = (S >= thr) & upper
        if mask is not None:
            m &= mask[i0 : i0 + B]
        true_c += int(m.sum())
        caught += int((m & share).sum())
    return true_c, caught


def test_recall_floor_sf001_fixture_regime():
    V = _load("/root/testdata/sf0.01")
    assert _auto_bits(len(V)) == 4
    true_c, caught = _pair_stats(V, 4, 0.4)
    assert true_c > 0, "corpus lost its >= 0.4 pairs — regenerate floors"
    assert caught / true_c >= FLOOR, (
        f"sf0.01 bits=4 recall@0.4 = {caught / true_c:.4f} < {FLOOR}"
    )


def test_recall_floor_sf01_scaled_regime():
    V = _load("/root/testdata/sf0.1")
    assert _auto_bits(len(V)) == 5
    true_c, caught = _pair_stats(V, 5, 0.6)
    assert true_c > 0, "corpus lost its >= 0.6 pairs — regenerate floors"
    assert caught / true_c >= FLOOR, (
        f"sf0.1 bits=5 recall@0.6 = {caught / true_c:.4f} < {FLOOR}"
    )


def test_recall_floor_10x_replica_regime():
    """The §9x-a regime: 20,000 vectors -> 9 bits per band, with the
    90,000 planted exact-duplicate pairs from the tiling."""
    V = _load("/root/testdata/sf0.1")
    n, r = len(V), 10
    bits = _auto_bits(n * r)
    assert bits == 9
    true_b, caught_b = _pair_stats(V, bits, 0.6)
    planted = n * (r * (r - 1) // 2)  # same-origin pairs, cos = 1
    true_t = planted + r * r * true_b
    caught_t = planted + r * r * caught_b
    assert caught_t / true_t >= FLOOR, (
        f"10x bits=9 recall@0.6 = {caught_t / true_t:.4f} < {FLOOR} "
        f"(cross-origin base: {caught_b}/{true_b})"
    )


def test_recall_floor_hard_negative_cross_label():
    """hard_negative_mining candidates are the SAME buckets filtered
    to label(a) != label(b); planted same-origin duplicates share a
    label, so the 10x cross-label truth is exactly 100 copies of each
    cross-label base pair."""
    V = _load("/root/testdata/sf0.1")
    labels = _load_labels("/root/testdata/sf0.1")
    bits = _auto_bits(len(V) * 10)
    cross = labels[:, None] != labels[None, :]
    true_b, caught_b = _pair_stats(V, bits, 0.6, mask=cross)
    if true_b == 0:
        pytest.skip("no cross-label pairs >= 0.6 in the base corpus")
    assert caught_b / true_b >= FLOOR, (
        f"cross-label bits=9 recall@0.6 = {caught_b / true_b:.4f} < {FLOOR}"
    )
