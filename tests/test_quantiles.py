"""Direct unit tests of operators/quantiles.py::equal_freq_bucket —
including the n < n_buckets regime, where several boundary ranks
coincide and the boundary-tuple multiplicity logic is what keeps the
rank-count identity exact (sf-level oracle runs never reach this
corner: they always have n >> n_buckets)."""

from __future__ import annotations

import pytest

from distributedmapreduce_spark.operators.quantiles import equal_freq_bucket


def _naive(vals, n_buckets, descending):
    """1 + ((rn-1)*k) // n over (value <dir>, tiebreak asc)."""
    order = sorted(
        vals, key=lambda t: ((-t[1]) if descending else t[1], t[0])
    )
    n = len(order)
    return {
        tid: 1 + ((rn - 1) * n_buckets) // n
        for rn, (tid, _v) in enumerate(order, start=1)
    }


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize(
    "vals",
    [
        [(1, 7)],  # n=1 << buckets
        [(1, 5), (2, 5), (3, 5)],  # all-tied, n < buckets
        [(1, 10), (2, 20), (3, 30), (4, 40)],  # n < buckets, distinct
        [(i, (i * 37) % 11) for i in range(1, 25)],  # ties, n > buckets
        [(i, 5000 + i * 4096) for i in range(1, 13)],  # bucket-sparse
    ],
)
def test_equal_freq_bucket_matches_rank_formula(spark, vals, descending):
    df = spark.createDataFrame(vals, "tid long, v long")
    out = {
        r.tid: r.b
        for r in equal_freq_bucket(
            df, "v", "tid", "b", 10, bucket_width=64, descending=descending
        ).collect()
    }
    assert out == _naive(vals, 10, descending)


def test_equal_freq_bucket_three_buckets(spark):
    vals = [(i, i % 6) for i in range(1, 20)]
    df = spark.createDataFrame(vals, "tid long, v long")
    out = {
        r.tid: r.b
        for r in equal_freq_bucket(
            df, "v", "tid", "b", 3, bucket_width=2
        ).collect()
    }
    assert out == _naive(vals, 3, False)
