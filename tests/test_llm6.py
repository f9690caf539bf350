"""Distributed BPE trainer (plans/llm6.py) — third-implementation
replay: the Spark side applies merges with an F.aggregate fold and the
DuckDB oracle with window chain-parity; this module replays the whole
spec in pure Python (dict counting + explicit greedy-leftmost loop)
and demands exact equality, including on an adversarial repeated-pair
corpus ('aaaa' runs) where the three merge-application algorithms can
legitimately diverge if any of them mis-handles overlap."""

from __future__ import annotations

import re

from distributedmapreduce_spark.plans.llm6 import _BPE_K
from distributedmapreduce_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _py_bpe(texts: list[str], k_steps: int):
    vocab: dict[str, int] = {}
    for text in texts:
        for w in text.lower().split(" "):
            if w and re.fullmatch(r"[a-z0-9]+", w):
                vocab[w] = vocab.get(w, 0) + 1
    seqs = {w: list(w) for w in vocab}
    merges = []
    for step in range(1, k_steps + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, toks in seqs.items():
            f = vocab[w]
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + f
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, a + b, cnt))
        for w, toks in seqs.items():
            out: list[str] = []
            for x in toks:  # greedy leftmost, single pass
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            seqs[w] = out
    return merges


def test_bpe_matches_pure_python_replay(spark):
    texts = [
        r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    want = _py_bpe(texts, _BPE_K)
    got = sorted(
        (r.step, r.left, r.right, r.merged, r.cnt)
        for r in QUERIES["bpe_train_merges"](spark, SF).collect()
    )
    assert got == sorted(want)


def test_bpe_repeated_pair_overlap_semantics(spark, tmp_path):
    """'aaaa'-run corpus: merging (a, a) must fuse leftmost-first
    non-overlapping — aaaa -> [aa, aa], aaa -> [aa, a].  A naive
    string replace or all-positions merge diverges here."""
    texts = [
        "aaaa aaaa aaa bq bq xyz xyz xyz",
        "aaaa aa bq aaa aaa wvu wvu",
        "bq bq bq aaaa xyz wvu qrs qrs",
        "qrs xyz aaaa bq wvu aaa qrs",
    ]
    docs = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    want = _py_bpe(texts, _BPE_K)
    got = sorted(
        (r.step, r.left, r.right, r.merged, r.cnt)
        for r in QUERIES["bpe_train_merges"](spark, str(tmp_path)).collect()
    )
    assert got == sorted(want)
    # the first merge must be (a, a) with the non-overlap count:
    # aaaa contributes 2 pairs post-greedy?  No: pair COUNTING is
    # pre-merge and counts all adjacent occurrences: 3 per 'aaaa',
    # 2 per 'aaa' — freq-weighted across the corpus.
    step1 = [m for m in want if m[0] == 1][0]
    assert (step1[1], step1[2]) == ("a", "a")
