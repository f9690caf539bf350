"""Reusable text column expressions (pure built-ins; codegen-friendly
where Spark supports it, interpreted HOFs kept linear-time)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CLEAN_RE = "[^a-zA-Z0-9 ]"


def clean_line(col) -> Column:
    """The reference's line cleaner (master.py:43): strip everything
    outside [a-zA-Z0-9 ]."""
    return F.regexp_replace(col, CLEAN_RE, "")


def tokens(col, lowercase: bool = False) -> Column:
    """Non-empty single-space-split tokens (mapper_word_count.py:16-18)."""
    base = F.lower(col) if lowercase else F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(base, " "), lambda x: x != F.lit(""))


def shingles(col, n: int = 3) -> Column:
    """Distinct word n-gram shingles, linear-time via zip_with of
    shifted token arrays (sequence+slice is O(tokens^2) interpreted)."""
    if n == 1:
        return F.array_distinct(tokens(col, lowercase=True))
    ws = tokens(col, lowercase=True)
    acc = ws
    for k in range(1, n):
        shifted = F.slice(ws, k + 1, F.greatest(F.size(ws) - k, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
    # zip_with pads with null and concat_ws drops nulls — trim the
    # short tail entries explicitly
    return F.array_distinct(
        F.slice(acc, 1, F.greatest(F.size(ws) - (n - 1), F.lit(0)))
    )


def norm_fingerprint(col) -> Column:
    """md5 of whitespace-normalized lowercase text (exact-dedup key)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(col, " +", " "))))
