"""Regression test for the IVF dead-centroid guard (round-8 ADVICE):
a seed centroid whose cluster loses every member in the Lloyd
refinement stays all-zero, and before the guard its normalized row
was NaN — np.argmax over a matrix with a NaN column then assigned
EVERY vector to the dead cluster, silently corrupting the index
(ann_ivf_topk is rows-only checked, so no oracle would catch it).

The corpus engineers exactly that death deterministically: 100
one-hot vectors, seeds are vec_id 0..15 (k_lists floor = 16), and
vec 1 is an exact duplicate of vec 0 — every pos-0 vector ties
between centroids 0 and 1 and argmax breaks to the LOWER index, so
cluster 1 ends the refinement memberless and its centroid is the
zero vector.  With the guard the index stays correct: every query
still gets exactly top-5, and same-position vectors (true cosine
1.0) are found.
"""

from __future__ import annotations

from distributedmapreduce_spark.plans.registry import QUERIES

DIM = 64
N = 100
# one-hot positions: seeds 0..15 get position = vec_id, EXCEPT vec 1
# which duplicates vec 0; non-seeds cycle over every position but 1,
# so nothing else can rescue centroid 1 either
_POS_CYCLE = [0] + list(range(2, 16))


def _pos(i: int) -> int:
    if i < 16:
        return 0 if i == 1 else i
    return _POS_CYCLE[i % len(_POS_CYCLE)]


def _vec(i: int) -> list[float]:
    v = [0.0] * DIM
    v[_pos(i)] = 1.0
    return v


def test_dead_centroid_does_not_corrupt_index(spark, tmp_path):
    spark.createDataFrame(
        [(i, _vec(i)) for i in range(N)],
        schema="vec_id long, embedding array<double>",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    rows = QUERIES["ann_ivf_topk"](spark, str(tmp_path)).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)

    # all 10 queries (vec_id < 10) present with exactly top-5 each —
    # under the pre-guard NaN corruption every vector landed in one
    # list and probe pruning starved most queries of candidates
    assert sorted(per_q) == list(range(10))
    assert all(len(v) == 5 for v in per_q.values())
    # cosines are real numbers in [-1, 1] (NaN would violate this)
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)
    # query 0's duplicate (vec 1) and its pos-0 mates are found at
    # cosine exactly 1.0 — the index still routes same-direction
    # vectors into the probed list despite the dead centroid
    top0 = {r.neighbor_id for r in per_q[0]}
    assert 1 in top0
    assert all(r.cosine == 1.0 for r in per_q[0])
