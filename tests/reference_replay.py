"""Pure-Python replay of the reference's verified semantics
(SURVEY.md §1.1-1.2, §5.2) — the oracle for the text-pipeline tests.

Derived from master.py:31-47 (preprocess + cursor),
mapper_word_count.py:11-22 (tokenize), reducer_*.py:11-18 (aggregate).
Operates on raw lines WITHOUT trailing newlines (spark.read.text
convention): a raw "\\n" line is represented as "".
"""

from __future__ import annotations

import re
from collections import defaultdict

CLEAN_RE = re.compile(r"[^a-zA-Z0-9 ]")


def replay_lines(raw_lines: list[str]) -> list[tuple[int, str, int]]:
    """-> [(line_id, cleaned_line, byte_offset)] for kept (non-blank) lines."""
    out = []
    cursor = 0
    for i, raw in enumerate(raw_lines):
        if raw == "":
            cursor += 1  # reference: raw "\n" advances by len("\n") == 1
            continue
        cleaned = CLEAN_RE.sub("", raw)
        out.append((i, cleaned, cursor))
        cursor += len(cleaned)
    return out


def replay_tokens(lines: list[tuple[int, str, int]]) -> list[tuple[str, int]]:
    pairs = []
    for _line_id, cleaned, base in lines:
        off = base
        for tok in cleaned.split(" "):
            if tok == "":
                continue  # empty tokens emit nothing and advance nothing
            pairs.append((tok, off))
            off += len(tok) + 1
    return pairs


def replay_word_count(pairs: list[tuple[str, int]]) -> dict[str, int]:
    counts: dict[str, int] = defaultdict(int)
    for w, _ in pairs:
        counts[w] += 1
    return dict(counts)


def replay_inverted_index(pairs: list[tuple[str, int]]) -> dict[str, list[int]]:
    postings: dict[str, list[int]] = defaultdict(list)
    for w, off in pairs:
        postings[w].append(off)
    return {w: sorted(v) for w, v in postings.items()}


def load_reference_input(path: str = "/root/reference/input.txt") -> list[str]:
    with open(path, encoding="utf-8", errors="surrogateescape") as f:
        content = f.read()
    # splitlines() mirrors spark.read.text: no trailing-newline tokens
    return content.split("\n")[:-1] if content.endswith("\n") else content.split("\n")
