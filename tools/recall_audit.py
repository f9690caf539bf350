"""Recall audit for the embedding sign-LSH blocking (SCALE.md §9x-a).

tools/pair_growth.py measures what the blocking COSTS; this measures
what it MISSES: for each corpus scale, the exact brute-force pair set
at several cosine thresholds (numpy blockwise — no Spark needed) is
compared against the candidate set the production auto-bits recipe
(dedup_embedding_cosine: 16 bands, bits = clamp(bit_length(n/64),
4, 16), bits >= 4 from the deterministic coordinate-difference
hyperplanes) would generate.  Prints recall per (scale, threshold).

Usage:
    python3 tools/recall_audit.py [dir ...]

Defaults to /root/testdata/sf0.1 and the /tmp/pairscale10 replica
(generated on demand by tools/pair_growth.py).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLDS = (0.4, 0.6, 0.8)


def _load(dirpath: str) -> np.ndarray:
    import duckdb

    p = f"{dirpath}/embeddings.parquet"
    if os.path.isdir(p):
        p = p + "/*.parquet"
    rows = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{p}') ORDER BY vec_id"
    ).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


def _signatures(V: np.ndarray, bits: int) -> np.ndarray:
    """Replays embedding_band_buckets' auto recipe (16 bands)."""
    n = len(V)
    sig = np.zeros((n, 16), dtype=np.int64)
    for band in range(16):
        for j in range(bits):
            if j < 4:
                bit = V[:, band * 4 + j] > 0
            else:
                p = (band * 4 + j * 7) % 64
                q = (band * 4 + j * 13 + 1) % 64
                bit = V[:, p] > V[:, q]
            sig[:, band] += bit.astype(np.int64) << j
    return sig


def audit(dirpath: str) -> None:
    from distributedmapreduce_spark.plans.llm import _emb_lsh_auto_bits

    V = _load(dirpath)
    n = len(V)
    bits = _emb_lsh_auto_bits(n)
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    sig = _signatures(V, bits)
    true_c = {t: 0 for t in THRESHOLDS}
    caught = {t: 0 for t in THRESHOLDS}
    B = 2000
    for i0 in range(0, n, B):
        S = U[i0 : i0 + B] @ U.T
        share = np.zeros(S.shape, dtype=bool)
        for band in range(16):
            share |= (
                sig[i0 : i0 + B, band][:, None] == sig[None, :, band]
            )
        upper = (
            np.arange(n)[None, :]
            > (i0 + np.arange(S.shape[0]))[:, None]
        )
        for t in THRESHOLDS:
            m = (S >= t) & upper
            true_c[t] += int(m.sum())
            caught[t] += int((m & share).sum())
    for t in THRESHOLDS:
        r = caught[t] / max(1, true_c[t])
        print(
            f"{dirpath}  n={n}  bits={bits}  cos>={t}: "
            f"true={true_c[t]:,}  caught={caught[t]:,}  recall={r:.4f}"
        )


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/pairscale10"]
    for d in dirs:
        if not os.path.exists(f"{d}/embeddings.parquet"):
            print(f"skip {d}: no embeddings.parquet", file=sys.stderr)
            continue
        audit(d)


if __name__ == "__main__":
    main()
